"""Pins kernels/selk_resolve.py against the XLA overlap-resolution chain
(device.py `_per_sample_grid`, reference semantics instancer.cpp:498-560).

The chain is re-stated here verbatim as `_ref_chain` — it IS the spec the
kernel must match.  Reductions/cumsum associate differently in the kernel
(Hillis-Steele vs XLA's choice), so sel_k may flip only on provable ~1e-5
knife edges; everywhere else sel_k/n_active are exact and p_sel matches to
rtol 1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerftex_tpu.kernels.selk_resolve import selk_resolve


def _ref_chain(tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel, method, rng_blend):
    """The device.py grid-path chain, verbatim (jnp so XLA evaluates it)."""
    K = tk0.shape[-1]
    t = t_pt[..., None]
    tk0b, tk1b, kv = tk0[:, None, :], tk1[:, None, :], kvalid[:, None, :]
    active = kv & (tk0b <= t) & (t < tk1b)
    n_active = jnp.sum(active, -1)
    iv_dist = jnp.maximum(tk0b - t, t - tk1b)
    iv_dist = jnp.where(kv, jnp.maximum(iv_dist, 0.0), jnp.inf)
    fallback_k = jnp.argmin(iv_dist, -1)
    active = jnp.where(
        (n_active == 0)[..., None],
        jax.nn.one_hot(fallback_k, K, dtype=bool),
        active,
    )
    n_active = jnp.maximum(n_active, 1)

    cum = None
    if method == "random":
        target = jnp.minimum(
            jnp.floor(u_sel * n_active).astype(jnp.int32), n_active - 1
        )
        rank = jnp.cumsum(active, -1) - 1
        sel_k = jnp.argmax(active & (rank == target[..., None]), -1)
        p_sel = jnp.zeros_like(u_sel)
    else:
        d2_k = sel_a[:, None, :] + 2.0 * t * sel_b[:, None, :] + t * t
        d2_k = jnp.where(active, jnp.maximum(d2_k, 0.0), jnp.inf)
        if method == "nearest":
            sel_k = jnp.argmin(d2_k, -1)
            p_sel = jnp.zeros_like(u_sel)
        else:
            dist_k = jnp.where(active, jnp.sqrt(d2_k), jnp.inf)
            min_d = jnp.min(dist_k, -1, keepdims=True)
            w = jnp.where(
                active, jnp.maximum(rng_blend + min_d - dist_k, 0.0), 0.0
            )
            prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
            cum = jnp.cumsum(prob, -1)
            sel_k = jnp.clip(
                jnp.sum((u_sel[..., None] > cum).astype(jnp.int32), -1),
                0, K - 1,
            )
            oh = sel_k[..., None] == jnp.arange(K)[None, None, :]
            p_sel = jnp.sum(jnp.where(oh, prob, 0.0), -1)
    return sel_k, p_sel, n_active, cum


def _inputs(key, rb, s, k, invalid_frac=0.3):
    ks = jax.random.split(key, 8)
    tk0 = jax.random.uniform(ks[0], (rb, k), minval=0.0, maxval=2.0)
    tk1 = tk0 + jax.random.uniform(ks[1], (rb, k), minval=0.05, maxval=0.8)
    kvalid = jax.random.uniform(ks[2], (rb, k)) > invalid_frac
    # sel_a/b shaped so d2 >= 0 in-interval: closest-point quadratic
    # (t - c)^2 + r^2 form -> a = c^2 + r^2, b = -c.
    c = jax.random.uniform(ks[3], (rb, k), minval=0.0, maxval=2.5)
    r2 = jax.random.uniform(ks[4], (rb, k), minval=0.0, maxval=0.2)
    sel_a = c * c + r2
    sel_b = -c
    t_pt = jax.random.uniform(ks[5], (rb, s), minval=-0.1, maxval=2.6)
    u_sel = jax.random.uniform(ks[6], (rb, s))
    return tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel


@pytest.mark.parametrize("method", ["nearest_blend", "nearest", "random"])
@pytest.mark.parametrize("rb,s,k", [(16, 32, 24), (8, 130, 128), (12, 17, 48)])
def test_selk_kernel_matches_chain(method, rb, s, k):
    blend = 0.15
    args = _inputs(jax.random.key(hash((method, rb, s, k)) % 2**31), rb, s, k)
    tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel = args

    ref_sel, ref_p, ref_n, ref_cum = jax.jit(
        _ref_chain, static_argnums=(7,)
    )(tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel, method, blend)
    sel, p, n = selk_resolve(
        tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel,
        method=method, blend_range=blend, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))

    sel, ref_sel = np.asarray(sel), np.asarray(ref_sel)
    mism = sel != ref_sel
    if mism.any():
        # Every mismatch must sit on a ~ulp knife edge of the method's
        # comparison (association noise, not a semantic bug).
        assert method == "nearest_blend", f"{method}: exact methods diverged"
        edge = np.min(
            np.abs(np.asarray(u_sel)[..., None] - np.asarray(ref_cum)), -1
        )
        bad = mism & (edge > 1e-5)
        assert not bad.any(), (
            f"{bad.sum()} sel_k mismatches off knife edges "
            f"(max edge {edge[mism].max()})"
        )
        assert mism.mean() < 1e-2
    ok = ~mism
    np.testing.assert_allclose(
        np.asarray(p)[ok], np.asarray(ref_p)[ok], rtol=1e-4, atol=1e-7
    )


def test_selk_kernel_fallback_and_all_invalid():
    """Rays with no active interval fall back to the nearest interval;
    all-invalid rays pick k=0 (argmin over all-inf), n_active clamps to 1."""
    rb, s, k = 8, 16, 24
    tk0 = jnp.tile(jnp.linspace(10.0, 12.0, k)[None], (rb, 1))  # never active
    tk1 = tk0 + 0.5
    kvalid = jnp.ones((rb, k), bool).at[0].set(False)  # ray 0: all invalid
    sel_a = jnp.ones((rb, k)) * 4.0
    sel_b = -jnp.ones((rb, k))
    t_pt = jnp.tile(jnp.linspace(0.0, 2.0, s)[None], (rb, 1))
    u_sel = jnp.full((rb, s), 0.5)

    ref_sel, ref_p, ref_n, _ = jax.jit(_ref_chain, static_argnums=(7,))(
        tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel, "nearest_blend", 0.1
    )
    sel, p, n = selk_resolve(
        tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel,
        method="nearest_blend", blend_range=0.1, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(ref_sel))
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))
    assert (np.asarray(n) == 1).all()
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p), rtol=1e-6)


def test_selk_kernel_padding_independence():
    """Rb not a multiple of b_rays and S not a multiple of bs: padded
    rows/cols must not leak into real outputs."""
    rb, s, k = 11, 37, 48
    args = _inputs(jax.random.key(7), rb, s, k)
    full = selk_resolve(*args, method="nearest", interpret=True)
    # same data through a different padding geometry
    alt = selk_resolve(*args, method="nearest", interpret=True,
                       lanes=256, s_rows=16)
    for a, b in zip(full, alt):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from nerftex_tpu.tools import gen_assets

    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


@pytest.mark.parametrize("method", ["nearest", "nearest_blend", "random"])
def test_instancer_grid_path_parity(assets, method, monkeypatch):
    """pallas_selk ON vs OFF through the real DeviceInstancer grid path on
    the cloth scene (the per-scene config knob, operating_points.py;
    NERFTEX_PALLAS_SELK env stays unset here so the kwarg decides).
    'nearest'/'random' picks are exact (order-independent min /
    integer-valued cumsum), so every output must match bit-for-bit up to
    cross-graph fma noise; 'nearest_blend' may flip on ~ulp cum knife
    edges, so only a vanishing mismatch fraction is allowed and matched
    samples must agree."""
    import os

    monkeypatch.delenv("NERFTEX_PALLAS_SELK", raising=False)
    from nerftex_tpu.instancing.device import DeviceInstancer
    from nerftex_tpu.instancing.scene import Scene

    rs = np.random.RandomState(0)
    n_rays = 16
    rays_o = np.concatenate(
        [rs.uniform(-0.5, 0.5, (n_rays, 2)), np.full((n_rays, 1), 4.0)], -1
    ).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    params = np.tile(np.array([1.0], np.float32), (n_rays, 1))

    outs = {}
    for flag in (False, True):
        scene = Scene(
            b_0=[-1.4, -1.2, -0.1],
            b_1=[1.2, 1.2, 1.8],
            textures=("",),
            instance_sampling_method=method,
            seed=0,
        )
        scene.distribute_instances_on_mesh(
            os.path.join(assets, "cloth_mesh.ply"), 0.09,
            os.path.join(assets, "cloth_anchor_points.ply"),
        )
        dev = DeviceInstancer(scene, max_hits=32, ray_block=16,
                              pallas_selk=flag)
        out = dev.get_model_input(rays_o, rays_d, params, 64, 0.04)
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}

    a, b = outs[False], outs[True]
    assert sorted(a) == sorted(b)
    assert a["hit"].any()
    inst_a, inst_b = a["instance_id"], b["instance_id"]
    mism = inst_a != inst_b
    if method in ("nearest", "random"):
        assert not mism.any(), f"{method}: exact pick diverged"
    else:
        assert mism.mean() < 1e-2, f"blend flips too common: {mism.mean()}"
    ok = ~mism
    for k in sorted(a):
        if a[k].dtype.kind == "f":
            av, bv = a[k], b[k]
            m = ok
            while m.ndim < av.ndim:
                m = m[..., None]
            m = np.broadcast_to(m, av.shape) if av.shape[:ok.ndim] == ok.shape else np.ones_like(av, bool)
            # nearest_blend's prob normalization (w / sum_K w) associates
            # differently in the kernel's sublane reduce -> ~1e-4 relative
            # noise on the blend weight; exact methods match to fp noise.
            rtol = 1e-3 if method == "nearest_blend" else 1e-5
            np.testing.assert_allclose(
                av[m], bv[m], atol=1e-5, rtol=rtol, err_msg=k
            )
        elif k != "instance_id":
            assert np.array_equal(a[k], b[k]), k
