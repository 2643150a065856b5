"""GaussianModel facade tests (reference surface: MTLEngine, mtl_engine.hpp:40-57)."""

import numpy as np
import jax.numpy as jnp

from gaussiansplatting_tpu.config import Config, RasterConfig
from gaussiansplatting_tpu.core import gaussians as G
from gaussiansplatting_tpu.models import GaussianModel

from conftest import make_camera_for_scene, make_scene


def _cfg():
    return Config(raster=RasterConfig(pair_capacity=2048, pair_block=16))


def _params(rng, n=48):
    means, log_scales, quats, raw_op, sh_dc = make_scene(rng, n=n, spread=0.6)
    sh = np.zeros((n, 4, 3), np.float32)
    sh[:, 0, :] = sh_dc
    return G.from_arrays(means, log_scales, quats, raw_op, sh)


def test_model_roundtrip_and_train(tmp_path, rng):
    cam = make_camera_for_scene(width=64, height=48)
    gt_model = GaussianModel.from_params(_params(rng), _cfg())
    gt = gt_model.render(cam)
    assert gt.shape == (48, 64, 3)

    model = GaussianModel.from_params(_params(np.random.default_rng(7)), _cfg())
    before = float(np.abs(model.render(cam) - gt).mean())
    model.train([cam], [jnp.asarray(gt)], epochs=6)
    after = float(np.abs(model.render(cam) - gt).mean())
    assert after < before
    assert model.num_gaussians == 48

    ply = str(tmp_path / "m.ply")
    assert model.save_ply(ply) == 48
    reloaded = GaussianModel.from_ply(ply, _cfg())
    np.testing.assert_allclose(reloaded.render(cam), model.render(cam), atol=1e-3)

    ck = str(tmp_path / "m.npz")
    model.save_checkpoint(ck)
    resumed = GaussianModel.from_checkpoint(ck)
    np.testing.assert_array_equal(
        np.asarray(resumed.params.means), np.asarray(model.params.means)
    )
