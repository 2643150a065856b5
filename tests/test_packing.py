"""bf16 2-in-1 sort-payload packing (ops/packing.py) and the packed
windowed-blend path (RasterConfig.payload_dtype="bf16").

The packing halves the live sort-operand count of the fat (tile, depth)
pair sort and the backward by-Gaussian cotangent sort (docs/DESIGN.md cost
model: sort cost is per-operand, dtype-independent).  Precision contract:
conic / opacity / color and all cotangents ride as round-to-nearest-even
bf16 (the reference blends in HALF precision, tiled_shaders.metal:326-328);
screen positions and the f32 reduction prefix-sums stay exact."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.config import RasterConfig
from gaussiansplatting_tpu.ops import packing
from gaussiansplatting_tpu.ops.pairs import reduce_aligned_cotangents
from gaussiansplatting_tpu.ops.rasterize import render

from conftest import make_camera_for_scene, make_scene
from test_pallas_blend import _params


def test_pack2_roundtrip_exact_for_bf16_values(rng):
    """Values already representable in bf16 survive pack2/unpack2 bit-exactly
    (including negatives, zeros, and large magnitudes)."""
    a = rng.normal(size=(4, 256)).astype(np.float32) * 1e3
    b = rng.normal(size=(4, 256)).astype(np.float32) * 1e-3
    a = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    b = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32)
    a[0, 0] = 0.0
    b[0, 1] = -0.0
    pa, pb = packing.unpack2(packing.pack2(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(np.asarray(pa), a)
    np.testing.assert_array_equal(np.asarray(pb), b)


def test_pack2_matches_bf16_rne(rng):
    """pack2 quantization equals XLA's own f32->bf16 conversion (RNE), so the
    error bound is the bf16 ulp: |err| <= 2^-8 * |x|."""
    x = rng.normal(size=(8192,)).astype(np.float32) * np.exp(
        rng.uniform(-20, 20, 8192).astype(np.float32)
    )
    xa, _ = packing.unpack2(packing.pack2(jnp.asarray(x), jnp.zeros_like(x)))
    want = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(np.asarray(xa), want)
    err = np.abs(np.asarray(xa) - x)
    assert (err <= np.abs(x) * 2.0 ** -8 + 1e-38).all()


def test_pack_cols_odd_tail(rng):
    cols = [jnp.asarray(np.asarray(
        jnp.asarray(rng.normal(size=(64,)).astype(np.float32), jnp.bfloat16),
        np.float32)) for _ in range(7)]
    packed = packing.pack_cols(cols)
    assert len(packed) == 4
    out = packing.unpack_cols(packed, 7)
    assert len(out) == 7
    for c, o in zip(cols, out):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(o))


def test_reduce_aligned_cotangents_packed_paths(rng):
    """Packed-row reduction (both grad_reduce modes) equals the unpacked
    reduction when the cotangents are bf16-representable: the sort carries
    packed operands but the f32 prefix sums stay exact."""
    n, a_cap, d = 13, 256, 9
    gid = rng.integers(-1, n, a_cap).astype(np.int32)
    rows = np.asarray(jnp.asarray(
        rng.normal(size=(d, a_cap)).astype(np.float32), jnp.bfloat16
    ), np.float32)
    rows[:, gid < 0] = 0.0
    counts = np.bincount(gid[gid >= 0], minlength=n).astype(np.int32)
    packed = jnp.stack(packing.pack_cols([jnp.asarray(r) for r in rows]))
    for mode in ("sortprefix", "scatter"):
        want = reduce_aligned_cotangents(
            jnp.asarray(rows), jnp.asarray(gid), jnp.asarray(counts), n, mode
        )
        got = reduce_aligned_cotangents(
            packed, jnp.asarray(gid), jnp.asarray(counts), n, mode,
            packed_out=d,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=1e-5,
            err_msg=mode,
        )


def _cfg(payload_dtype):
    return RasterConfig(
        pair_capacity=2048, pair_block=16, blend_impl="pallas",
        payload_dtype=payload_dtype,
    )


def test_bf16_payload_render_close_to_f32(rng):
    """Full windowed render with payload_dtype=bf16 vs f32: the image moves
    by at most the bf16 quantization envelope of conic/opacity/color."""
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    img_f, aux_f = jax.jit(render, static_argnums=2)(params, cam, _cfg("f32"))
    img_b, aux_b = jax.jit(render, static_argnums=2)(params, cam, _cfg("bf16"))
    assert int(aux_f.num_pairs) == int(aux_b.num_pairs)
    diff = np.abs(np.asarray(img_f) - np.asarray(img_b))
    assert diff.max() < 0.06, diff.max()
    assert diff.mean() < 5e-3, diff.mean()


@pytest.mark.slow
def test_bf16_payload_gradients_close_to_f32(rng):
    """Parameter gradients under the packed path stay within a few percent
    of the f32 path (quantized render data AND bf16-packed cotangent sort)."""
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    weights = jnp.asarray(
        rng.uniform(0.5, 1.0, (48, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = render(p, cam, cfg)
        return jnp.sum(img * weights)

    gf = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(
        params, _cfg("f32"))
    gb = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(
        params, _cfg("bf16"))
    for f in ("means", "log_scales", "quats", "raw_opacities", "sh"):
        a, b = np.asarray(getattr(gf, f)), np.asarray(getattr(gb, f))
        assert np.isfinite(b).all(), f
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 5e-2, f"{f}: rel diff {rel}"


def test_sol_model_sanity():
    """Speed-of-light model invariants: packing reduces bytes, never flops;
    floors scale with capacity; the bf16 matmul floor undercuts fp32."""
    from gaussiansplatting_tpu.utils import sol

    f32 = sol.step_model(100_000, 1 << 21, 608, 800, packed=False)
    b16 = sol.step_model(100_000, 1 << 21, 608, 800, packed=True)
    assert b16["bytes_total"] < f32["bytes_total"]
    assert b16["mxu_flops"] == f32["mxu_flops"]
    assert b16["t_flops_ms"] < f32["t_flops_ms"]
    pp = sol.step_model(100_000, 1 << 21, 608, 800, packed=True,
                        pack_positions=True)
    assert pp["bytes_total"] < b16["bytes_total"]
    assert pp["mxu_flops"] == b16["mxu_flops"]
    big = sol.step_model(1_500_000, 1 << 24, 608, 800, packed=True)
    assert big["bytes_total"] > 4 * b16["bytes_total"]
    slim = sol.step_model(1_500_000, 1 << 24, 608, 800, packed=True,
                          chunk_slack=0.5)
    assert slim["bytes_total"] < big["bytes_total"]
    for m in (f32, b16, big, slim):
        assert m["floor_ms"] == max(m["t_bytes_ms"], m["t_flops_ms"])


def test_pack_positions_render_close_to_f32(rng):
    """pack_positions (tile-relative bf16 positions, one packed sort
    operand, docs/DESIGN.md roadmap #5): the render stays inside the bf16
    payload envelope — position quantization is radius-bounded so its
    power-term error (~r^2/sigma^2 * 2^-8) is the same order as the
    conic/opacity quantization already accepted."""
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    cfg_pp = RasterConfig(
        pair_capacity=2048, pair_block=16, blend_impl="pallas",
        payload_dtype="bf16", pack_positions=True,
    )
    img_f, aux_f = jax.jit(render, static_argnums=2)(params, cam, _cfg("f32"))
    img_p, aux_p = jax.jit(render, static_argnums=2)(params, cam, cfg_pp)
    assert int(aux_f.num_pairs) == int(aux_p.num_pairs)
    diff = np.abs(np.asarray(img_f) - np.asarray(img_p))
    assert diff.max() < 0.06, diff.max()
    assert diff.mean() < 5e-3, diff.mean()


@pytest.mark.slow
def test_pack_positions_gradients_close_to_f32(rng):
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=48)
    cfg_pp = RasterConfig(
        pair_capacity=2048, pair_block=16, blend_impl="pallas",
        payload_dtype="bf16", pack_positions=True,
    )
    weights = jnp.asarray(
        rng.uniform(0.5, 1.0, (48, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = render(p, cam, cfg)
        return jnp.sum(img * weights)

    gf = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(
        params, _cfg("f32"))
    gp = jax.jit(jax.grad(loss, allow_int=True), static_argnums=1)(
        params, cfg_pp)
    for f in ("means", "log_scales", "quats", "raw_opacities", "sh"):
        a, b = np.asarray(getattr(gf, f)), np.asarray(getattr(gp, f))
        assert np.isfinite(b).all(), f
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 5e-2, f"{f}: rel diff {rel}"


def test_pack_positions_strip_render_matches_full(rng):
    """pack_positions under tile_rows strips (the multi-chip path): the
    expansion-time tile centers use ABSOLUTE tile rows, the kernel
    reconstructs them from strip-local ids + row0 — a mismatch would shift
    every splat by 16 px per strip row.  Strips must stack to the full
    frame."""
    params = _params(rng)
    cam = make_camera_for_scene(width=64, height=64)  # 4 tile rows
    cfg = RasterConfig(
        pair_capacity=2048, pair_block=16, blend_impl="pallas",
        payload_dtype="bf16", pack_positions=True,
    )
    full, _ = jax.jit(render, static_argnums=2)(params, cam, cfg)

    strips = []
    for row0 in range(0, 4, 2):
        s, _ = jax.jit(
            render, static_argnums=(2, 4, 5)
        )(params, cam, cfg, None, 256, (row0, 2))
        strips.append(np.asarray(s))
    stacked = np.concatenate(strips, axis=0)[: cam.height]
    np.testing.assert_allclose(stacked, np.asarray(full), atol=1e-5)
