import numpy as np
import jax

from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.models.mlp import Nerf, ParamNerf, CoarseFine


FF10 = EasyDict({"module": "network.model.FourierFeatures", "n_freq_bands": 10})
FF4 = EasyDict({"module": "network.model.FourierFeatures", "n_freq_bands": 4})


def _carpet_model(**overrides):
    kwargs = dict(
        pos_embedding=EasyDict(FF10),
        dir_embedding=EasyDict(FF4),
        param_embedding=EasyDict(FF4),
        n_parameters=[1, 6],
    )
    kwargs.update(overrides)
    return ParamNerf(**kwargs)


def test_param_nerf_shapes_and_param_count():
    models = _carpet_model()
    model = models["model"]
    n = 17
    pos = np.random.rand(n, 3).astype(np.float32)
    dirs = np.random.rand(n, 3).astype(np.float32)
    prms = np.random.rand(n, 7).astype(np.float32)
    color, density = model((pos, dirs, prms))
    assert color.shape == (n, 3)
    assert density.shape == (n, 1)
    # Topology-derived parameter count (matches the keras reference layer dims):
    # trunk in 63+9=72, skip at 4 reinjects 72.
    expected = 0
    in_dim = 63 + 9
    trunk_in = in_dim
    for i in range(8):
        expected += (in_dim + 1) * 256
        in_dim = 256 + (trunk_in if i == 4 else 0)
    expected += (in_dim + 1) * 1          # alpha head
    expected += (in_dim + 1) * 256        # bottleneck
    in_dim = 256 + 27 + 54                # + dir FF(4) on 3 dims + app FF(4) on 6
    expected += (in_dim + 1) * 256        # color_depth=1
    expected += (256 + 1) * 128           # pre_color
    expected += (128 + 1) * 3             # color
    assert model.n_params() == expected


def test_param_nerf_is_deterministic_under_seed():
    from nerftex_tpu.utils import rng
    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    m1 = _carpet_model()["model"]
    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    m2 = _carpet_model()["model"]
    for a, b in zip(m1.trainable_variables, m2.trainable_variables):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_nerf_geo_only_conditioning():
    models = _carpet_model(n_parameters=3)  # int -> [3, 0]
    model = models["model"]
    color, density = model((np.zeros((4, 3), np.float32), np.zeros((4, 3), np.float32), np.zeros((4, 3), np.float32)))
    assert color.shape == (4, 3)


def test_param_nerf_ipe_variant():
    ipe = EasyDict({"module": "network.model.IntegratedPositionalEncoding", "n_freq_bands": 10})
    models = _carpet_model(pos_embedding=ipe, n_pos=6)
    model = models["model"]
    color, density = model((np.zeros((4, 6), np.float32), np.zeros((4, 3), np.float32), np.zeros((4, 7), np.float32)))
    assert color.shape == (4, 3)


def test_nerf_base_model():
    models = Nerf(pos_embedding=EasyDict(FF10), dir_embedding=EasyDict(FF4))
    model = models["model"]
    color, density = model((np.zeros((4, 3), np.float32), np.zeros((4, 3), np.float32), np.zeros((4, 0), np.float32)))
    assert color.shape == (4, 3) and density.shape == (4, 1)


def test_coarse_fine_creates_two_models():
    models = CoarseFine(
        EasyDict({
            "module": "network.model.ParamNerf",
            "pos_embedding": EasyDict(FF10),
            "dir_embedding": EasyDict(FF4),
            "param_embedding": EasyDict(FF4),
        }),
        n_parameters=[1, 6],
    )
    assert set(models) == {"model", "model_fine"}
    # Independent initializations.
    w1 = np.asarray(models["model"].params["trunk"][0]["w"])
    w2 = np.asarray(models["model_fine"].params["trunk"][0]["w"])
    assert not np.allclose(w1, w2)


def test_model_apply_is_jittable_and_differentiable():
    model = _carpet_model()["model"]
    pos = np.random.rand(8, 3).astype(np.float32)
    dirs = np.random.rand(8, 3).astype(np.float32)
    prms = np.random.rand(8, 7).astype(np.float32)

    def loss(params):
        c, d = model.apply(params, pos, dirs, prms)
        return (c**2).sum() + (d**2).sum()

    g = jax.jit(jax.grad(loss))(model.params)
    flat = jax.tree.leaves(g)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)


def test_enc_parts_gate_matches_concat(monkeypatch):
    """NERFTEX_ENC_PARTS ON vs OFF: same params, same inputs -> outputs
    equal to partial-sum association noise (the blocks are in concat order,
    so the split matmuls see identical weight rows)."""
    from nerftex_tpu.models import mlp as mlp_mod
    from nerftex_tpu.utils import rng

    rs = np.random.RandomState(3)
    pos = rs.randn(64, 3).astype(np.float32)
    dirs = rs.randn(64, 3).astype(np.float32)
    prms = rs.rand(64, 7).astype(np.float32)

    for kwargs in (
        {},                      # param_depth 0: param encodings split too
        {"param_depth": 1},      # param MLP keeps the concat form
        {"embedding_config": EasyDict(
            {"module": "network.layer.IntegratedPositionalEncoding",
             "n_freq_bands": 4}), "n_pos": 6},
    ):
        outs = {}
        for flag in (False, True):
            monkeypatch.setattr(mlp_mod, "_ENC_PARTS", flag)
            rng.set_seed(0)
            mlp_mod._INIT_COUNTER[0] = 0
            if kwargs.get("n_pos") == 6:
                p6 = np.concatenate([pos, np.abs(prms[:, :3])], -1)
                model = _carpet_model(**kwargs)["model"]
                outs[flag] = model((p6, dirs, prms))
            else:
                model = _carpet_model(**kwargs)["model"]
                outs[flag] = model((pos, dirs, prms))
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )
