"""Interactive viewer — the TPU answer to the reference's live GLFW window
(``--view path.ply``, main.mm:231-297, mtl_engine.mm:89-160,401-609).

A TPU host has no display, so instead of a window this serves a small web
page: the browser sends orbit-camera state (drag = orbit, wheel = dolly,
shift-drag = pan) and the server renders each frame on demand through the
SAME depth-exact tiled pipeline used for training (ops/rasterize.py) — the
reference's viewer instead re-sorts splats globally per frame
(gpu_sort.mm:1-120); the tiled path needs no separate sort.

  python -m gaussiansplatting_tpu.tools.view --ply model.ply [--port 8000]
      [--width 800 --height 600] [--fov 60] [--sh-degree 0]

Then open http://localhost:8000/ (ssh -L 8000:localhost:8000 for remote).
One render resolution is compiled once; frames are JPEG over HTTP.  On a
TPU chip a frame is tens of ms — interactive; on CPU use small sizes.
"""

from __future__ import annotations

import argparse
import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gaussiansplatting_tpu viewer</title><style>
  body { margin:0; background:#111; color:#ccc; font:13px monospace; }
  #hud { position:fixed; top:8px; left:8px; background:#000a; padding:6px 8px;
         border-radius:4px; pointer-events:none; }
  img { display:block; margin:0 auto; image-rendering:auto; }
</style></head><body>
<div id="hud">drag = orbit · wheel = dolly · shift-drag = pan · loading…</div>
<img id="v" draggable="false">
<script>
const img = document.getElementById('v'), hud = document.getElementById('hud');
let st = null, busy = false, dirty = true;
fetch('/state').then(r => r.json()).then(s => { st = s; tick(); });
function url() {
  return '/frame?az=' + st.az.toFixed(4) + '&el=' + st.el.toFixed(4) +
    '&r=' + st.r.toFixed(4) + '&cx=' + st.cx.toFixed(4) +
    '&cy=' + st.cy.toFixed(4) + '&cz=' + st.cz.toFixed(4);
}
function tick() {
  if (!st || busy || !dirty) { requestAnimationFrame(tick); return; }
  busy = true; dirty = false;
  const t0 = performance.now();
  fetch(url()).then(r => r.blob()).then(b => {
    img.src = URL.createObjectURL(b);
    hud.textContent = 'az ' + st.az.toFixed(2) + ' el ' + st.el.toFixed(2) +
      ' r ' + st.r.toFixed(2) + ' · ' + (performance.now() - t0).toFixed(0) + ' ms';
    busy = false; requestAnimationFrame(tick);
  }).catch(() => { busy = false; requestAnimationFrame(tick); });
}
let drag = null;
img.addEventListener('mousedown', e => { drag = [e.clientX, e.clientY, e.shiftKey]; });
window.addEventListener('mouseup', () => { drag = null; });
window.addEventListener('mousemove', e => {
  if (!drag || !st) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) {      // pan in the camera's screen plane
    const s = st.r * 0.002;
    const ca = Math.cos(st.az), sa = Math.sin(st.az);
    st.cx += (-sa * -dx) * s; st.cz += (ca * -dx) * s; st.cy += dy * s;
  } else {
    st.az -= dx * 0.01;
    st.el = Math.max(-1.5, Math.min(1.5, st.el + dy * 0.01));
  }
  drag = [e.clientX, e.clientY, drag[2]]; dirty = true;
});
window.addEventListener('wheel', e => {
  if (!st) return;
  st.r = Math.max(0.05, st.r * Math.exp(e.deltaY * 0.001)); dirty = true;
});
</script></body></html>"""


class ViewerState:
    """Shared render state: params + compiled render fn + scene framing."""

    def __init__(self, params, cfg, width, height, fov_deg, center, radius):
        import jax

        from gaussiansplatting_tpu.ops.rasterize import render as raster_render

        self.params = params
        self.cfg = cfg
        self.width = width
        self.height = height
        self.fy = height / (2.0 * math.tan(math.radians(fov_deg) / 2.0))
        self.center = center
        self.radius = radius
        self.lock = threading.Lock()  # one device program at a time
        self._render = jax.jit(raster_render, static_argnums=2)

    def frame_jpeg(self, az, el, r, cx, cy, cz, quality=85) -> bytes:
        from PIL import Image

        from gaussiansplatting_tpu.core import camera as camera_mod

        cam = camera_mod.orbit_camera(
            np.array([cx, cy, cz], np.float32), r, azimuth=az, elevation=el,
            fx=self.fy, fy=self.fy, width=self.width, height=self.height,
        )
        with self.lock:
            img, _ = self._render(self.params, cam, self.cfg.raster)
            arr = np.asarray(img)
        buf = io.BytesIO()
        Image.fromarray(
            np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
        ).save(buf, "JPEG", quality=quality)
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif u.path == "/state":
                self._send(200, "application/json", json.dumps({
                    "az": 0.0, "el": 0.3, "r": state.radius,
                    "cx": float(state.center[0]),
                    "cy": float(state.center[1]),
                    "cz": float(state.center[2]),
                }).encode())
            elif u.path == "/frame":
                q = parse_qs(u.query)

                def f(k, d):
                    try:
                        return float(q[k][0])
                    except (KeyError, ValueError):
                        return d

                body = state.frame_jpeg(
                    f("az", 0.0), f("el", 0.3), f("r", state.radius),
                    f("cx", state.center[0]), f("cy", state.center[1]),
                    f("cz", state.center[2]),
                )
                self._send(200, "image/jpeg", body)
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def build_state(ply, width, height, fov, sh_degree, pair_capacity):
    from gaussiansplatting_tpu.config import Config, RasterConfig
    from gaussiansplatting_tpu.core import gaussians as gaussians_mod
    from gaussiansplatting_tpu.io import ply as ply_mod

    cfg = Config(raster=RasterConfig(
        pair_capacity=pair_capacity, sh_degree=sh_degree
    ))
    cloud = ply_mod.load_gaussian_ply(ply)
    params = gaussians_mod.from_arrays(
        cloud.means, cloud.log_scales, cloud.quats, cloud.raw_opacities,
        cloud.sh,
    )
    center = cloud.means.mean(axis=0)
    spread = float(
        np.percentile(np.linalg.norm(cloud.means - center, axis=1), 90)
    )
    return ViewerState(
        params, cfg, width, height, fov, center, max(spread * 2.5, 1e-3)
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ply", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--sh-degree", type=int, default=0, choices=(0, 1))
    p.add_argument("--pair-capacity", type=int, default=1 << 21)
    args = p.parse_args(argv)

    state = build_state(
        args.ply, args.width, args.height, args.fov, args.sh_degree,
        args.pair_capacity,
    )
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"viewer at http://localhost:{args.port}/ "
          f"({state.width}x{state.height}, n={int(np.asarray(state.params.alive).sum())})",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
