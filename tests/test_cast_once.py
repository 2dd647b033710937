"""Hoisted parameter cast (renderer.chunked_apply cast_params /
Renderer(cast_params_once=True)).

TPU perf knob (docs/PERF.md §1.7): parameters are cast to the model's
compute dtype ONCE per step, outside the net-chunk scan, so the scan's
transpose accumulates each weight's chunk gradients in the compute
dtype/layout and converts to f32 once — instead of one convert-and-relayout
fusion per leaf per chunk (the §1.4 `bf16[32,2,8,128]` family).

Pins: (a) f32 models are BIT-identical (the hoisted cast is a no-op there,
so the graph computes the same values); (b) bf16 models produce the same
loss to bf16 resolution and grads within the bf16 chunk-summation
tolerance; (c) the knob composes with remat="save_encodings"; (d) a
single-chunk call (n <= net_chunk, no scan) is exactly equivalent.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.render.renderer import Renderer
from nerftex_tpu.render.loss import AlphaLoss
import nerftex_tpu.models.mlp as mlp_mod


def _models(dtype="float32", seed=0):
    rng.set_seed(seed)
    mlp_mod._INIT_COUNTER[0] = 0
    ff = lambda n: {"module": "network.model.FourierFeatures", "n_freq_bands": n}
    return util.instantiate(EasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": ff(6), "dir_embedding": ff(2), "param_embedding": ff(2),
        "n_parameters": [1, 6], "depth": 3, "width": 64, "skips": [1],
        "compute_dtype": dtype,
    }))


def _batch(b=2, r=32, seed=0):
    rs = np.random.RandomState(seed)
    d = rs.normal(size=(b, r, 3)).astype(np.float32)
    d[..., 2] = -np.abs(d[..., 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(np.tile([0, 0, 3.0], (b, r, 1)).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "t": jnp.asarray(np.tile([1.0, 5.0], (b, r, 1)).astype(np.float32)),
        "cone_scale": jnp.full((b, r, 1), 1e-3, jnp.float32),
        "parameters": jnp.asarray(rs.uniform(0, 1, (b, 7)).astype(np.float32)),
        "color": jnp.asarray(rs.uniform(0, 1, (b, r, 3)).astype(np.float32)),
        "alpha": jnp.asarray(rs.uniform(0, 1, (b, r)).astype(np.float32)),
    }


def _loss_and_grads(models, cast_once, remat=False, net_chunk=256):
    # b=2 x r=32 x 16 samples = 1024 points -> 4 chunks of 256.
    renderer = Renderer(
        n_samples=16, net_chunk=net_chunk, remat_net_chunks=remat,
        cast_params_once=cast_once, perturb=True, **models,
    )
    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    batch = _batch()

    def loss_of(params):
        pred = renderer.apply(params, batch, jax.random.key(7), training=True)
        return loss_fn(color_true=batch["color"], alpha_true=batch["alpha"], **pred)

    params = {name: m.params for name, m in models.items()}
    return jax.jit(jax.value_and_grad(loss_of))(params)


def test_cast_once_f32_bit_identical():
    loss0, g0 = _loss_and_grads(_models("float32"), cast_once=False)
    loss1, g1 = _loss_and_grads(_models("float32"), cast_once=True)
    assert float(loss0) == float(loss1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cast_once_bf16_matches_within_chunk_sum_tolerance():
    loss0, g0 = _loss_and_grads(_models("bfloat16"), cast_once=False,
                                remat="save_encodings")
    loss1, g1 = _loss_and_grads(_models("bfloat16"), cast_once=True,
                                remat="save_encodings")
    # Forward is unchanged up to fusion reassociation (~1 ulp bf16).
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-2)
    # Grads: per-chunk sums round to bf16 between chunks (4 chunks here).
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2)


def test_cast_once_single_chunk_no_scan_equivalent():
    # n=1024 points <= net_chunk=4096: no scan; hoisted cast == in-body cast.
    loss0, g0 = _loss_and_grads(_models("bfloat16"), cast_once=False,
                                net_chunk=4096)
    loss1, g1 = _loss_and_grads(_models("bfloat16"), cast_once=True,
                                net_chunk=4096)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)
