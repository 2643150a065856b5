"""Pallas block-blend kernels vs the XLA reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU via bench/verify flows).

Locks in: identical forward images, identical gradients for all five
parameter groups, and the hand-derived backward against jax.grad of the XLA
blend (SURVEY.md §7.1: custom VJP with transmittance replay)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.config import RasterConfig
from gaussiansplatting_tpu.core import gaussians as G
from gaussiansplatting_tpu.ops.rasterize import render
from gaussiansplatting_tpu.ops.pallas_blend import block_blend_pallas

from conftest import make_camera_for_scene, make_scene


def _params(rng, n=48):
    means, log_scales, quats, raw_op, sh_dc = make_scene(rng, n=n, spread=0.6)
    sh = np.zeros((n, 4, 3), np.float32)
    sh[:, 0, :] = sh_dc
    return G.from_arrays(means, log_scales, quats, raw_op, sh)


def _cfgs():
    kw = dict(pair_capacity=2048, pair_block=16)
    return (
        RasterConfig(**kw, blend_impl="xla"),
        RasterConfig(**kw, blend_impl="pallas"),
    )


def test_forward_image_matches_xla(rng):
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    cfg_x, cfg_p = _cfgs()
    img_x, aux_x = jax.jit(render, static_argnums=2)(params, cam, cfg_x)
    img_p, aux_p = jax.jit(render, static_argnums=2)(params, cam, cfg_p)
    np.testing.assert_allclose(np.asarray(img_x), np.asarray(img_p), atol=2e-5)
    assert int(aux_x.num_pairs) == int(aux_p.num_pairs)


def test_gradients_match_xla(rng):
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    cfg_x, cfg_p = _cfgs()
    weights = jnp.asarray(
        rng.uniform(0.5, 1.0, (48, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = render(p, cam, cfg)
        return jnp.sum(img * weights)

    gx = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(params, cfg_x)
    gp = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(params, cfg_p)
    for f in ("means", "log_scales", "quats", "raw_opacities", "sh"):
        a, b = np.asarray(getattr(gx, f)), np.asarray(getattr(gp, f))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-4, f"{f}: rel diff {rel}"


def test_block_blend_vjp_matches_autodiff(rng):
    """Direct unit check of the kernel pair on random block data."""
    nb, b, ts = 5, 16, 8
    coef = jnp.asarray(rng.normal(size=(nb, 8, b)).astype(np.float32)) * 0.05
    # make the quadratic negative-definite-ish so some powers land in (0, -4.5)
    coef = coef.at[:, 0, :].set(-jnp.abs(coef[:, 0, :]) - 0.01)
    coef = coef.at[:, 2, :].set(-jnp.abs(coef[:, 2, :]) - 0.01)
    coef = coef.at[:, 6:, :].set(0.0)
    opacity = jnp.asarray(rng.uniform(0.05, 0.95, (nb, b)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (nb, 4, b)).astype(np.float32))
    color = color.at[:, 3, :].set(0.0)
    consts = (ts, -4.5, 0.99, 1.0 / 255.0)

    out = block_blend_pallas(coef, opacity, color, consts)
    assert out.shape == (nb, 4, ts * ts)
    assert np.isfinite(np.asarray(out)).all()

    g = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))

    def scalar(c, o, col):
        return jnp.sum(block_blend_pallas(c, o, col, consts) * g)

    grads = jax.grad(scalar, argnums=(0, 1, 2))(coef, opacity, color)

    # numeric check of a few random coordinates via central differences
    flat_idx = [(0, 5, 3), (2, 0, 7), (4, 4, 1)]
    for (i, r, c) in flat_idx:
        eps = 1e-3
        cp = coef.at[i, r, c].add(eps)
        cm = coef.at[i, r, c].add(-eps)
        fd = (float(scalar(cp, opacity, color)) - float(scalar(cm, opacity, color))) / (2 * eps)
        an = float(grads[0][i, r, c])
        assert abs(an - fd) < 0.05 * abs(fd) + 1e-2, (i, r, c, an, fd)
