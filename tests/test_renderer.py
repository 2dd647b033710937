import numpy as np
import jax
import jax.numpy as jnp

from nerftex_tpu.render.renderer import Renderer, MipRenderer, chunked_apply
from nerftex_tpu.render.loss import AlphaLoss, NerfLoss, mse, smape
from nerftex_tpu.models.mlp import Model


def _constant_model(sigma=2.0, color_logit=0.0):
    """Analytic stub: constant density + color everywhere."""

    def apply(params, pos, dirs, prms):
        n = pos.shape[0]
        color = jnp.full((n, 3), color_logit, jnp.float32) + 0.0 * params["w"].sum()
        density = jnp.full((n, 1), sigma, jnp.float32)
        return color, density

    return Model("model", {"w": jnp.zeros(1)}, apply)


def _ray_batch(b=1, r=8, t0=1.0, t1=2.0, n_params=2):
    data = {
        "rays_o": np.zeros((b, r, 3), np.float32),
        "rays_d": np.tile(np.array([0, 0, 1.0], np.float32), (b, r, 1)),
        "t": np.tile(np.array([t0, t1], np.float32), (b, r, 1)),
        "parameters": np.zeros((b, n_params), np.float32),
        "cone_scale": np.full((b, r, 1), 0.01, np.float32),
    }
    return data


def test_renderer_matches_analytic_transmittance():
    sigma, t0, t1 = 2.0, 1.0, 2.0
    model = _constant_model(sigma=sigma)
    renderer = Renderer(model=model, n_samples=512, perturb=False)
    data = _ray_batch(b=2, r=4, t0=t0, t1=t1)
    out = renderer.apply(renderer.current_params(), data, jax.random.key(0), training=False)
    # Homogeneous slab of length (t1-t0): alpha = 1 - exp(-sigma*L) modulo the
    # repeated-last-dist convention.
    L = (t1 - t0) * 512 / 511
    expected_alpha = 1 - np.exp(-sigma * L)
    np.testing.assert_allclose(np.asarray(out["alpha_pred"]), expected_alpha, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["color_pred"]), 0.5 * expected_alpha, atol=2e-3)


def test_renderer_masks_missed_rays():
    model = _constant_model()
    renderer = Renderer(model=model, n_samples=16, perturb=False)
    data = _ray_batch(b=1, r=4)
    data["t"][0, 2] = [np.inf, np.inf]
    out = renderer.apply(renderer.current_params(), data, jax.random.key(0))
    out_c = np.asarray(out["color_pred"])[0]
    out_a = np.asarray(out["alpha_pred"])[0]
    assert np.all(out_c[2] == 0) and out_a[2] == 0
    assert np.all(out_c[0] > 0) and out_a[0] > 0


def test_renderer_missed_rays_get_background():
    model = _constant_model(sigma=0.0)
    renderer = Renderer(model=model, n_samples=8, perturb=False)
    data = _ray_batch(b=1, r=2)
    data["t"][0, 1] = [np.inf, np.inf]
    out = renderer.apply(
        renderer.current_params(), data, jax.random.key(0),
        composite_bkgd=True, bkgd_color=[1, 0, 0.5],
    )
    c = np.asarray(out["color_pred"])[0]
    np.testing.assert_allclose(c[1], [1, 0, 0.5], atol=1e-5)  # miss -> pure bkgd
    np.testing.assert_allclose(c[0], [1, 0, 0.5], atol=1e-5)  # transparent hit


def test_renderer_call_chunks_and_reshapes():
    model = _constant_model()
    renderer = Renderer(model=model, n_samples=8, perturb=False, render_chunk=16)
    data = _ray_batch(b=2, r=23)  # 46 rays -> 3 chunks of 16 with padding
    out = renderer(**data, training=False)
    assert out["color_pred"].shape == (2, 23, 3)
    assert out["alpha_pred"].shape == (2, 23)
    ref = renderer.apply(renderer.current_params(), data, jax.random.key(0), training=False)
    np.testing.assert_allclose(
        np.asarray(out["color_pred"]), np.asarray(ref["color_pred"]), atol=1e-5
    )


def test_renderer_importance_outputs_coarse_and_fine():
    model = _constant_model()
    renderer = Renderer(model=model, n_samples=16, n_importance=8, perturb=False)
    data = _ray_batch()
    out = renderer.apply(renderer.current_params(), data, jax.random.key(0))
    assert set(out) == {"color_pred", "alpha_pred", "color_pred_coarse", "alpha_pred_coarse"}


def test_renderer_gradients_flow():
    def apply(params, pos, dirs, prms):
        h = jnp.tanh(pos @ params["w"])
        return h, jnp.sum(h, -1, keepdims=True)

    model = Model("model", {"w": jnp.ones((3, 3)) * 0.1}, apply)
    renderer = Renderer(model=model, n_samples=8, perturb=False)
    data = _ray_batch()

    def loss(params):
        out = renderer.apply({"model": params}, data, jax.random.key(0))
        return jnp.sum(out["color_pred"] ** 2) + jnp.sum(out["alpha_pred"] ** 2)

    g = jax.grad(loss)(model.params)
    assert float(jnp.abs(g["w"]).sum()) > 0


def test_blur_idx_scales_parameter():
    seen = {}

    def apply(params, pos, dirs, prms):
        seen["prms"] = prms
        n = pos.shape[0]
        return jnp.zeros((n, 3)), jnp.zeros((n, 1)) + 0.0 * params["w"].sum()

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    renderer = Renderer(model=model, n_samples=4, perturb=False, blur_idx=0)
    data = _ray_batch(b=1, r=2, n_params=2)
    data["parameters"][:] = [2.0, 5.0]
    renderer.apply(renderer.current_params(), data, jax.random.key(0))
    prms = np.asarray(seen["prms"]).reshape(2, 4, 2)
    # Param 0 scaled by cone_scale * z per-sample; param 1 untouched.
    z = np.linspace(1, 2, 4)
    np.testing.assert_allclose(prms[0, :, 0], 2.0 * 0.01 * z, atol=1e-6)
    np.testing.assert_allclose(prms[0, :, 1], 5.0, atol=1e-6)


def test_mip_renderer_feeds_mean_cov_and_splices_blur():
    seen = {}

    def apply(params, pos, dirs, prms):
        seen["pos"] = pos
        seen["prms"] = prms
        n = pos.shape[0]
        return jnp.zeros((n, 3)), jnp.full((n, 1), 1.0) + 0.0 * params["w"].sum()

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    renderer = MipRenderer(model=model, n_samples=8, perturb=False, blur_idx=0)
    data = _ray_batch(b=1, r=2, n_params=3)
    data["parameters"][:] = [0.5, 7.0, 8.0]
    out = renderer.apply(renderer.current_params(), data, jax.random.key(0))
    assert seen["pos"].shape[-1] == 6  # [mean, cov_diag]
    assert seen["prms"].shape[-1] == 2  # blur spliced out
    np.testing.assert_allclose(np.asarray(seen["prms"])[0], [7.0, 8.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out["color_pred"])))


def test_chunked_apply_equals_direct():
    def apply(params, x, y):
        return x * params["s"] + y, x - y

    params = {"s": jnp.asarray(3.0)}
    x = jnp.arange(37, dtype=jnp.float32)[:, None]
    y = jnp.ones((37, 1))
    a1, b1 = chunked_apply(apply, params, (x, y), net_chunk=8)
    a2, b2 = apply(params, x, y)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_chunked_apply_rejects_unknown_remat_policy():
    """A remat-policy typo (e.g. 'save_encoding') must raise, not silently
    degrade to plain remat=True (ADVICE r4)."""
    import pytest

    def apply(params, x):
        return x

    with pytest.raises(ValueError, match="save_encodings"):
        chunked_apply(apply, {}, (jnp.ones((4, 1)),), net_chunk=8,
                      remat="save_encoding")


def test_losses():
    y = np.array([[0.5, 0.5, 0.5]], np.float32)
    p = np.array([[0.25, 0.5, 0.75]], np.float32)
    np.testing.assert_allclose(float(mse(y, p)), np.mean((y - p) ** 2), atol=1e-6)
    np.testing.assert_allclose(
        float(smape(y, p)), np.mean(np.abs(y - p) / (y + p + 1e-2)), atol=1e-6
    )

    loss = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    alpha_true = np.array([[1.0, 0.0]], np.float32)
    color_true = np.array([[[0.5, 0.5, 0.5], [0.3, 0.3, 0.3]]], np.float32)
    color_pred = np.array([[[0.4, 0.4, 0.4], [0.9, 0.9, 0.9]]], np.float32)
    alpha_pred = np.array([[0.8, 0.1]], np.float32)
    val = float(loss(color_true, alpha_true, color_pred, alpha_pred))
    # Masked color loss ignores the alpha=0 pixel entirely.
    masked_pred = color_pred.copy()
    masked_pred[0, 1] = 0
    masked_true = color_true.copy()
    masked_true[0, 1] = 0
    expected = np.mean(np.abs(masked_true - masked_pred) / (masked_true + masked_pred + 1e-2))
    expected += np.mean((alpha_true - alpha_pred) ** 2)
    np.testing.assert_allclose(val, expected, atol=1e-6)

    nl = NerfLoss()
    val2 = float(nl(color_true, color_pred, color_pred_coarse=color_pred))
    np.testing.assert_allclose(val2, 2 * np.mean((color_true - color_pred) ** 2), atol=1e-6)


def test_remat_net_chunks_matches_plain_gradients():
    """remat_net_chunks (jax.checkpoint over the net_chunk lax.map bodies,
    docs/PERF.md §1) must leave outputs and gradients numerically unchanged."""
    import jax
    import jax.numpy as jnp

    from nerftex_tpu.render.renderer import chunked_apply

    rs = np.random.RandomState(0)
    params = {"w": jnp.asarray(rs.randn(8, 16).astype(np.float32))}
    x = jnp.asarray(rs.randn(40, 8).astype(np.float32))

    def apply_fn(p, v):
        return jnp.tanh(v @ p["w"]) @ p["w"].T

    def loss(p, remat):
        return jnp.sum(chunked_apply(apply_fn, p, (x,), 16, remat=remat) ** 2)

    out0, out1 = loss(params, False), loss(params, True)
    np.testing.assert_allclose(float(out0), float(out1), rtol=1e-6)
    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(np.asarray(g0["w"]), np.asarray(g1["w"]), rtol=1e-4, atol=1e-4)


def test_mip_importance_opt_in_resolves_thin_slab():
    """mip_importance=True (extension; the reference raises
    NotImplementedError here, renderer.py:403-404) runs a hierarchical fine
    pass over fence posts resampled from the coarse weights.  A density slab
    thinner than the coarse segment spacing is invisible to the 8-segment
    coarse march (every frustum mean falls outside it) but must be resolved
    by the 8+32-post fine march."""
    sigma, z_lo, z_hi = 20.0, 1.45, 1.55

    def apply(params, pos, dirs, prms):
        z = pos[:, 2]  # frustum mean z (rays march +z from the origin)
        inside = (z > z_lo) & (z < z_hi)
        density = jnp.where(inside, sigma, 0.0)[:, None] + 0.0 * params["w"].sum()
        return jnp.zeros((pos.shape[0], 3)), density

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    renderer = MipRenderer(
        model=model, n_samples=8, n_importance=32, perturb=False,
        blur_idx=0, mip_importance=True,
    )
    data = _ray_batch(b=1, r=4, t0=1.0, t1=2.0, n_params=2)
    out = renderer.apply(renderer.current_params(), data, jax.random.key(0), training=False)

    assert set(out) >= {"color_pred", "alpha_pred", "color_pred_coarse", "alpha_pred_coarse"}
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    coarse = np.asarray(out["alpha_pred_coarse"])
    fine = np.asarray(out["alpha_pred"])
    # Analytic: alpha = 1 - exp(-sigma * (z_hi - z_lo)) ~= 0.865.
    assert np.all(coarse < 0.05), coarse
    assert np.all(fine > 0.5), fine
