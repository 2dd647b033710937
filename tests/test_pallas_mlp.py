import numpy as np
import pytest

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.kernels.mlp_pallas import make_fused_apply, fuse_model


def _carpet_model():
    rng.set_seed(0)
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0
    return util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 10},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "n_parameters": [1, 6],
            }
        )
    )["model"]


def test_fused_pallas_matches_reference_apply():
    m = _carpet_model()
    fused = make_fused_apply(m.static_topology, interpret=True, tile=128)
    rs = np.random.RandomState(0)
    pos = rs.rand(300, 3).astype(np.float32)  # non-multiple of tile: pads
    dirs = rs.rand(300, 3).astype(np.float32)
    prm = rs.rand(300, 7).astype(np.float32)
    c1, d1 = m.apply(m.params, pos, dirs, prm)
    c2, d2 = fused(m.params, pos, dirs, prm)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_fused_pallas_with_param_depth_and_geo_only():
    rng.set_seed(0)
    m = util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [2, 0],
                "param_depth": 1,
                "depth": 3,
                "width": 64,
                "skips": [1],
                "color_depth": 2,
            }
        )
    )["model"]
    fused = make_fused_apply(m.static_topology, interpret=True, tile=64)
    rs = np.random.RandomState(1)
    pos = rs.rand(100, 3).astype(np.float32)
    dirs = rs.rand(100, 3).astype(np.float32)
    prm = rs.rand(100, 2).astype(np.float32)
    c1, d1 = m.apply(m.params, pos, dirs, prm)
    c2, d2 = fused(m.params, pos, dirs, prm)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_fuse_model_swaps_apply():
    m = _carpet_model()
    orig = m.apply
    fuse_model(m, interpret=True, tile=128)
    assert m.apply is not orig
    rs = np.random.RandomState(2)
    c, d = m((rs.rand(16, 3).astype(np.float32), rs.rand(16, 3).astype(np.float32), rs.rand(16, 7).astype(np.float32)))
    assert np.asarray(c).shape == (16, 3)


def test_nerf_model_has_no_topology():
    rng.set_seed(0)
    m = util.instantiate(
        EasyDict(
            {
                "module": "network.model.Nerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
            }
        )
    )["model"]
    with pytest.raises(ValueError):
        fuse_model(m)
