"""Training-image loading (reference: image_loader.mm + stb_image).

The reference decodes every ground-truth view to an RGBA8 Metal texture
upfront (image_loader.mm:44-99).  Here images decode to float32 [H, W, 3]
numpy arrays in [0, 1]; the trainer ships them to device per step (or they can
be pre-committed with jax.device_put)."""

from __future__ import annotations

import os

import numpy as np


def load_image(path: str, target_size: tuple[int, int] | None = None) -> np.ndarray:
    """Decode an image to float32 [H, W, 3] in [0, 1]; optional (W, H) resize."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if target_size is not None and im.size != target_size:
            im = im.resize(target_size, Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0


def find_image(images_dir: str, name: str) -> str | None:
    """Resolve a COLMAP image name against the images directory, tolerating
    extension mismatches."""
    direct = os.path.join(images_dir, name)
    if os.path.exists(direct):
        return direct
    stem = os.path.splitext(name)[0]
    for ext in (".jpg", ".JPG", ".jpeg", ".png", ".PNG"):
        p = os.path.join(images_dir, stem + ext)
        if os.path.exists(p):
            return p
    return None


def save_ppm(path: str, image: np.ndarray) -> None:
    """Write a binary P6 PPM like the reference's render snapshots
    (saveTextureToPPM, mtl_engine.mm:19-63)."""
    arr = np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr[:, :, :3].tobytes())


def save_png(path: str, image: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
