"""Forward rasterizer parity vs the scalar NumPy oracle (SURVEY.md §4 item 2,
BASELINE config #1 analog on synthetic scenes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.config import RasterConfig
from gaussiansplatting_tpu.core import gaussians as G
from gaussiansplatting_tpu.ops import projection as proj_mod
from gaussiansplatting_tpu.ops.rasterize import render

from conftest import make_camera_for_scene, make_scene
from reference_renderer import render_reference, project_one


def _params_from_scene(scene, capacity=None):
    means, log_scales, quats, raw_op, sh_dc = scene
    n = means.shape[0]
    sh = np.zeros((n, 4, 3), np.float32)
    sh[:, 0, :] = sh_dc
    return G.from_arrays(means, log_scales, quats, raw_op, sh, capacity=capacity)


def _small_cfg():
    return RasterConfig(pair_capacity=4096, pair_block=32)


def test_projection_matches_oracle(small_scene):
    cam = make_camera_for_scene()
    cfg = _small_cfg()
    params = _params_from_scene(small_scene)
    proj = jax.jit(proj_mod.project, static_argnums=2)(params, cam, cfg)

    means, log_scales, quats, raw_op, sh_dc = small_scene
    view = np.asarray(cam.view, np.float64)
    viewproj = np.asarray(cam.viewproj, np.float64)
    n_checked = 0
    for i in range(means.shape[0]):
        ref = project_one(
            means[i], log_scales[i], quats[i], raw_op[i], sh_dc[i],
            view, viewproj, float(cam.fx), float(cam.fy), cam.width, cam.height,
        )
        if ref is None:
            assert not bool(proj.valid[i]), f"gaussian {i}: ours valid, oracle culled"
            continue
        assert bool(proj.valid[i]), f"gaussian {i}: ours culled, oracle valid"
        np.testing.assert_allclose(
            np.asarray(proj.screen_pos[i]), ref["screen"], atol=1e-2
        )
        np.testing.assert_allclose(np.asarray(proj.conic[i]), ref["conic"], rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(float(proj.depth[i]), ref["depth"], rtol=1e-5)
        np.testing.assert_allclose(float(proj.opacity[i]), ref["opacity"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(proj.color[i]), ref["color"], atol=1e-5)
        assert float(proj.radius[i]) == ref["radius"]
        assert tuple(np.asarray(proj.tile_min[i])) == ref["tmin"]
        assert tuple(np.asarray(proj.tile_max[i])) == ref["tmax"]
        n_checked += 1
    assert n_checked > 10  # scene shouldn't be fully culled


def test_forward_image_matches_oracle(small_scene):
    cam = make_camera_for_scene()
    cfg = _small_cfg()
    params = _params_from_scene(small_scene)

    img, aux = jax.jit(render, static_argnums=(2,))(params, cam, cfg)
    img = np.asarray(img)
    assert img.shape == (cam.height, cam.width, 3)
    assert not bool(aux.overflow)
    assert int(aux.num_pairs) > 0

    means, log_scales, quats, raw_op, sh_dc = small_scene
    ref = render_reference(
        means, log_scales, quats, raw_op, sh_dc,
        np.asarray(cam.view, np.float64), np.asarray(cam.viewproj, np.float64),
        float(cam.fx), float(cam.fy), cam.width, cam.height,
    )
    # Our renderer has no early T-termination; the oracle terminates at
    # T<=1e-4, bounding the difference by ~1e-4 per channel + fp32 noise.
    err = np.abs(img - ref)
    assert err.max() < 5e-3, f"max pixel err {err.max()}"
    assert err.mean() < 2e-4


@pytest.mark.slow
def test_forward_tfloor_exact_tightens_parity(rng):
    """With t_floor_exact the renderer reproduces the oracle's per-pixel
    early termination (tiled_shaders.metal:334) and parity tightens from
    the ~5e-3 termination gap to fp32 noise.  Uses the dense-overlap scene
    where transmittance actually crosses the 1e-4 floor."""
    means, log_scales, quats, raw_op, sh_dc = make_scene(rng, n=256, spread=0.15)
    raw_op = raw_op + 4.0  # near-opaque so T crosses the 1e-4 floor
    scene = (means, log_scales, quats, raw_op, sh_dc)
    cam = make_camera_for_scene(width=32, height=32)
    params = _params_from_scene(scene)
    ref = render_reference(
        means, log_scales, quats, raw_op, sh_dc,
        np.asarray(cam.view, np.float64), np.asarray(cam.viewproj, np.float64),
        float(cam.fx), float(cam.fy), cam.width, cam.height,
    )

    img = None
    for impl in ("xla", "pallas"):
        cfg = RasterConfig(
            pair_capacity=4096, pair_block=16, t_floor_exact=True,
            blend_impl=impl,
        )
        img, _ = jax.jit(render, static_argnums=(2,))(params, cam, cfg)
        err = np.abs(np.asarray(img) - ref)
        assert err.max() < 1e-5, f"{impl}: max pixel err {err.max()}"

    # termination must actually trigger somewhere for the test to mean much
    # (the bound without the floor is ~1e-4: the skipped tail sums to <= T_stop)
    cfg_off = RasterConfig(pair_capacity=4096, pair_block=16)
    img_off, _ = jax.jit(render, static_argnums=(2,))(params, cam, cfg_off)
    assert np.abs(np.asarray(img_off) - np.asarray(img)).max() > 1e-5


@pytest.mark.slow
def test_tfloor_gradients_match_between_impls(rng):
    """The hand-derived Pallas t-floor backward agrees with autodiff through
    the XLA t-floor path (both treat the termination mask as constant)."""
    scene = make_scene(rng, n=96, spread=0.2)
    cam = make_camera_for_scene(width=32, height=32)
    params = _params_from_scene(scene)

    fields = ("means", "log_scales", "quats", "raw_opacities", "sh")

    def loss(trainable, impl):
        cfg = RasterConfig(
            pair_capacity=2048, pair_block=16, t_floor_exact=True,
            blend_impl=impl,
        )
        img, _ = render(params.replace(**trainable), cam, cfg)
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    trainable = {f: getattr(params, f) for f in fields}
    g_x = jax.grad(lambda t: loss(t, "xla"))(trainable)
    g_p = jax.grad(lambda t: loss(t, "pallas"))(trainable)
    for f in fields:
        np.testing.assert_allclose(
            np.asarray(g_x[f]), np.asarray(g_p[f]),
            rtol=5e-3, atol=1e-5, err_msg=f,
        )


def test_forward_dense_overlap(rng):
    """Heavy overdraw: many gaussians stacked on one tile exercises multi-block
    composition within a tile."""
    scene = make_scene(rng, n=256, spread=0.15)
    cam = make_camera_for_scene(width=32, height=32)
    cfg = RasterConfig(pair_capacity=4096, pair_block=16)
    params = _params_from_scene(scene)
    img, aux = jax.jit(render, static_argnums=(2,))(params, cam, cfg)
    img = np.asarray(img)

    means, log_scales, quats, raw_op, sh_dc = scene
    ref = render_reference(
        means, log_scales, quats, raw_op, sh_dc,
        np.asarray(cam.view, np.float64), np.asarray(cam.viewproj, np.float64),
        float(cam.fx), float(cam.fy), cam.width, cam.height,
    )
    err = np.abs(img - ref)
    assert err.max() < 5e-3, f"max pixel err {err.max()}"


def test_empty_scene_renders_background():
    cam = make_camera_for_scene(width=32, height=32)
    cfg = RasterConfig(pair_capacity=256, pair_block=16)
    params = G.zeros(16)  # all dead
    img, aux = jax.jit(render, static_argnums=(2,))(params, cam, cfg)
    np.testing.assert_allclose(np.asarray(img), 1.0)  # white background
    assert int(aux.num_pairs) == 0


def test_pair_overflow_flag(rng):
    scene = make_scene(rng, n=128, spread=0.2)
    cam = make_camera_for_scene(width=32, height=32)
    cfg = RasterConfig(pair_capacity=16, pair_block=8)
    params = _params_from_scene(scene)
    _, aux = jax.jit(render, static_argnums=(2,))(params, cam, cfg)
    assert bool(aux.overflow)


def test_render_jit_cache(small_scene):
    """Same shapes -> no retrace; params are traced values."""
    cam = make_camera_for_scene()
    cfg = _small_cfg()
    params = _params_from_scene(small_scene)
    fn = jax.jit(render, static_argnums=(2,))
    img1, _ = fn(params, cam, cfg)
    params2 = params.replace(raw_opacities=params.raw_opacities - 10.0)  # invisible
    img2, _ = fn(params2, cam, cfg)
    assert np.asarray(img2).min() > 0.99  # all culled by pairgen opacity floor
    assert not np.allclose(np.asarray(img1), 1.0)
