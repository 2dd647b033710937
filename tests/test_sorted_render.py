"""Occupancy-sorted bucketed render path (device.render_grid_sorted):
equivalence with the dense grid path and empty-block handling."""

import os

import numpy as np
import pytest

from nerftex_tpu.utils import rng


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from nerftex_tpu.tools import gen_assets

    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


def _three_box_renderer(sorted_blocks, n=96, **kw):
    import jax.numpy as jnp

    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.render.instance_renderer import InstanceRenderer
    from nerftex_tpu.models.mlp import Model

    rng.set_seed(0)
    transforms = []
    for dz, rotz in ((0.0, 0.0), (1.5, 0.7), (3.0, 1.9)):
        c, s = np.cos(rotz), np.sin(rotz)
        transforms.append(
            np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, dz], [0, 0, 0, 1]], np.float32)
        )

    def apply(params, pos, dirs, prms):
        r2 = jnp.sum(pos**2, -1, keepdims=True)
        return pos, 8.0 * jnp.exp(-3.0 * r2) + 0.0 * params["w"].sum()

    inst = Instancer(
        b_0=[-0.6, -0.6, -0.4], b_1=[0.6, 0.6, 0.4],
        transformations=transforms, ray_block=32, max_hits=8, **kw,
    )
    model = Model("model", {"w": jnp.zeros(1)}, apply)
    return InstanceRenderer(
        instancer_config=inst, model=model, n_samples=64, step_size=0.05,
        render_chunk=n, sample_budget_per_ray=0, sorted_blocks=sorted_blocks,
    )


def _ray_batch(n=96):
    idx = np.arange(n)
    rays_o = np.stack(
        [(idx % 8 - 3.5) * 0.2, (idx // 8 - 3.5) * 0.2, np.full(n, 6.0)], -1
    ).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    return dict(
        rays_o=rays_o[None], rays_d=rays_d[None],
        t=np.tile([1.0, 9.0], (1, n, 1)).astype(np.float32),
        parameters=np.zeros((1, 0), np.float32),
        cone_scale=np.full((1, n, 1), 0.01, np.float32),
    )


def test_sorted_matches_dense_grid():
    """The sorted bucketed path must reproduce the dense grid render
    (identical per-ray jitter stream; <=2 ulp from reduction shapes)."""
    import jax

    data = _ray_batch()
    outs = {}
    for sb in (False, True):
        r = _three_box_renderer(sb)
        out = r(**data, training=False, key=jax.random.key(42))
        outs[sb] = (
            np.asarray(out["color_pred"])[0], np.asarray(out["alpha_pred"])[0]
        )
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-7)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=5e-7)
    assert outs[True][1].max() > 0.3  # scene actually rendered


def test_sorted_empty_frame():
    """A frame where every ray misses goes entirely through the empty-block
    branch and composites to zero."""
    import jax

    r = _three_box_renderer(True)
    data = _ray_batch()
    data["rays_o"] = data["rays_o"] + np.array([50.0, 0, 0], np.float32)
    out = r(**data, training=False, key=jax.random.key(0))
    assert float(np.abs(np.asarray(out["alpha_pred"])).max()) == 0.0
    assert float(np.abs(np.asarray(out["color_pred"])).max()) == 0.0


def test_sorted_shadow_scene_matches_dense():
    """Sorted path with lighting/shadow tables flowing through the permuted
    per-ray tables (light parameters at the reference layout)."""
    import jax

    # 7 parameters: geometry + appearance + light dir in the last slot
    # (the "light" texture entry marks the parameter index).
    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for sb in (False, True):
        r = _three_box_renderer(
            sb, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[sb] = np.asarray(out["color_pred"])[0]
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-7)


def test_sorted_all_knobs_matches_dense(assets):
    """The full shipped bench knob stack at once — primary instance/tri cull
    budgets, shadow instance/tri cull budgets, hit-capacity buckets (K=64),
    occupancy-sorted blocks — on a real cloth-mesh scene with instances,
    textures, a point of light and the mesh terminator.  Every knob is exact
    by construction (culled branches are taken only when the keep sets fit;
    bucket slices cover the finite prefix), so the composited frame must
    match the dense, budget-free path.  This is the integration net for the
    interactions the per-knob instancer tests cannot see (budgets evaluated
    per SORTED block on permuted rays, sliced K-tier tables feeding the
    culled branches, terminator + shadow tables flowing through the permute).
    """
    import jax
    import jax.numpy as jnp

    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.render.instance_renderer import InstanceRenderer
    from nerftex_tpu.models.mlp import Model

    def apply(params, pos, dirs, prms):
        r2 = jnp.sum(pos**2, -1, keepdims=True)
        color = 0.5 + 0.5 * jnp.tanh(pos + 0.0 * prms[..., :3])
        return color, 6.0 * jnp.exp(-3.0 * r2) + 0.0 * params["w"].sum()

    def build(sorted_blocks, budgets):
        rng.set_seed(0)
        inst = Instancer(
            b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
            mesh_path=os.path.join(assets, "cloth_mesh.ply"),
            patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
            patch_scale=0.09, jitter_amount=1.0, cast_shadow_rays=True,
            textures=[os.path.join(assets, "smooth_checkerboard.png"),
                      "", "", "", "light"],
            instance_sampling_method="nearest",
            max_hits=64,            # K >= 64 activates hit-capacity buckets
            ray_block=16, shadow_samples=8, max_steps_per_ray=48,
            **budgets,
        )
        model = Model("model", {"w": jnp.zeros(1)}, apply)
        return InstanceRenderer(
            instancer_config=inst, model=model, n_samples=48, step_size=0.02,
            render_chunk=128, sample_budget_per_ray=0,
            sorted_blocks=sorted_blocks,
        )

    # 128 rays fanning over the cloth: blocks land in different occupancy
    # and hit tiers, and the per-block keep sets straddle the budgets below
    # (some blocks take the culled branch, busy ones fall back to full).
    idx = np.arange(128)
    rays_o = np.stack(
        [(idx % 16 - 7.5) * 0.16, (idx // 16 - 3.5) * 0.28, np.full(128, 4.0)],
        -1,
    ).astype(np.float32)
    data = dict(
        rays_o=rays_o[None],
        rays_d=np.tile(np.array([0, 0, -1.0], np.float32), (1, 128, 1)),
        t=np.tile([0.5, 7.5], (1, 128, 1)).astype(np.float32),
        parameters=np.array([[1, 1, 1, 0.1, 0, 0, 1.0]], np.float32),
        cone_scale=np.full((1, 128, 1), 0.01, np.float32),
    )

    ref = build(False, {})
    n, n_tris = ref.instancer.n_instances(), ref.instancer.device.ds.n_tris
    budgets = dict(
        cull_budget=max(2, n // 2), tri_cull_budget=max(2, n_tris // 2),
        shadow_cull_budget=max(2, n // 2),
        shadow_tri_cull_budget=max(2, n_tris // 2),
    )
    out_ref = ref(**data, training=False, key=jax.random.key(11))
    out_knob = build(True, budgets)(**data, training=False, key=jax.random.key(11))

    color_r = np.asarray(out_ref["color_pred"])[0]
    color_k = np.asarray(out_knob["color_pred"])[0]
    alpha_r = np.asarray(out_ref["alpha_pred"])[0]
    alpha_k = np.asarray(out_knob["alpha_pred"])[0]
    # Tri-cull's gathered-subset Moller-Trumbore can compile with different
    # fma contraction than the full layout (see
    # test_tri_cull_budget_bitexact_when_covering) — tolerance is epsilon
    # scale, far below any real divergence.
    np.testing.assert_allclose(color_k, color_r, atol=2e-6)
    np.testing.assert_allclose(alpha_k, alpha_r, atol=2e-6)
    assert alpha_r.max() > 0.3  # the scene actually rendered


def test_packed_permute_bitexact(monkeypatch):
    """The dtype-grouped packed occupancy permute (NERFTEX_PACKED_PERMUTE=1,
    device.py _permute_rows_packed) must be bit-identical to the per-table
    gathers — on a shadowed scene so every table kind rides the permute
    (f32 K-tables, s32 n_steps, bool tiny/hit/kvalid/shadow_blocked,
    [R,1,3] color_last) plus the packed un-permute of the outputs."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_PACKED_PERMUTE", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    assert sorted(outs[True]) == sorted(outs[False])
    for k in sorted(outs[True]):
        assert np.array_equal(outs[True][k], outs[False][k], equal_nan=True), k
    assert outs[True]["alpha_pred"].max() > 0.3


def test_dmajor_select_bitexact(monkeypatch):
    """_onehot_pick's per-channel-plane emission (NERFTEX_DMAJOR_SELECT=1)
    is the same per-element where/sum arithmetic as the 4-D reduce — must be
    bit-identical on a shadowed scene (both call sites: the [Rb,S,D]
    hit-table select and the sparse-shadow [Rb,Ssh,2] pick)."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_DMAJOR_SELECT", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    for k in sorted(outs[True]):
        assert np.array_equal(outs[True][k], outs[False][k], equal_nan=True), k
    assert outs[True]["alpha_pred"].max() > 0.3


def test_event_relayout_bitexact(monkeypatch):
    """_force_rowmajor (NERFTEX_EVENT_RELAYOUT=1) is pure data movement —
    a materialized relayout of the event/hit tables between the sort/cumsum
    producers and the per-sample + sparse-shadow consumers.  The frame must
    be bit-identical with the gate on or off."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_EVENT_RELAYOUT", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    for k in sorted(outs[True]):
        assert np.array_equal(outs[True][k], outs[False][k], equal_nan=True), k
    assert outs[True]["alpha_pred"].max() > 0.3


def test_interval_pick_bitexact(monkeypatch):
    """_interval_pick (NERFTEX_INTERVAL_PICK=1) selects the same event index
    as the count + one-hot form — [cum[k-1], cum[k]) membership IS
    clip(count, 0, 2K-1) == k — via the same where/sum arithmetic, so the
    frame must be bit-identical (both call sites: the grid t_mu pick and
    the sparse-shadow (times_s, cum_excl) pick)."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_INTERVAL_PICK", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    for k in sorted(outs[True]):
        assert np.array_equal(outs[True][k], outs[False][k], equal_nan=True), k
    assert outs[True]["alpha_pred"].max() > 0.3


def test_runsel_walk_matches_onehot(monkeypatch):
    """The running-select segment walk (NERFTEX_RUNSEL_WALK=1) computes
    vals[clip(count, 0, 2K-1)] by construction — the select itself is exact,
    but XLA may contract i*step + t_off into an fma differently across the
    two graphs, shifting s_arc (and thus t_mu) by 1 ulp, so the frame is
    compared at epsilon tolerance rather than bitwise."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_RUNSEL_WALK", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    for k in sorted(outs[True]):
        np.testing.assert_allclose(
            outs[True][k], outs[False][k], atol=2e-6, err_msg=k
        )
    assert outs[True]["alpha_pred"].max() > 0.3


def test_running_select_unit():
    """_running_select against the one-hot count+pick reference on dense
    random event tables, including out-of-range queries (below the first
    event -> index 0 via init; above the last -> clipped to E-1)."""
    import jax.numpy as jnp

    from nerftex_tpu.instancing.device import _running_select

    rs = np.random.RandomState(3)
    R, E, Q = 16, 12, 25
    events = np.sort(rs.rand(R, E).astype(np.float32) * 2.0, axis=1)
    queries = (rs.rand(R, Q).astype(np.float32) * 3.0) - 0.5
    v0 = rs.randn(R, E).astype(np.float32)
    v1 = rs.randn(R, E).astype(np.float32)

    got0, got1 = _running_select(jnp.asarray(events), jnp.asarray(queries),
                                 (jnp.asarray(v0), jnp.asarray(v1)))
    j = np.clip((events[:, None, :] <= queries[:, :, None]).sum(-1), 0, E - 1)
    want0 = np.take_along_axis(v0, j, axis=1)
    want1 = np.take_along_axis(v1, j, axis=1)
    assert np.array_equal(np.asarray(got0), want0)
    assert np.array_equal(np.asarray(got1), want1)


def test_sorted_hit_bucketing_matches_dense():
    """K >= 64 activates hit-capacity buckets (device.py render_grid_sorted:
    per-block slicing of the K-width tables to the smallest covering tier);
    the sliced branches must still reproduce the dense grid render."""
    import jax
    import jax.numpy as jnp

    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.render.instance_renderer import InstanceRenderer
    from nerftex_tpu.models.mlp import Model

    # 72 instances in a 3D grid; rays through the stack see anywhere from 0
    # to ~24 overlapping boxes, so blocks land in different hit tiers.
    transforms = []
    for ix in range(4):
        for iy in range(3):
            for iz in range(6):
                m = np.eye(4, dtype=np.float32)
                m[0, 3] = (ix - 1.5) * 0.5
                m[1, 3] = (iy - 1.0) * 0.5
                m[2, 3] = iz * 0.35
                transforms.append(m)

    def apply(params, pos, dirs, prms):
        r2 = jnp.sum(pos**2, -1, keepdims=True)
        return pos, 4.0 * jnp.exp(-3.0 * r2) + 0.0 * params["w"].sum()

    def build(sorted_blocks):
        rng.set_seed(0)
        inst = Instancer(
            b_0=[-0.4, -0.4, -0.3], b_1=[0.4, 0.4, 0.3],
            transformations=transforms, ray_block=16, max_hits=64,
            # Deterministic overlap mode: the sorted path's u_sel stream is
            # per-SORTED-block, so 'random' legitimately differs from dense
            # by stream (render_grid_sorted docstring) — 'nearest' is the
            # bit-exact comparison the dense-equivalence tests rely on.
            instance_sampling_method="nearest",
        )
        model = Model("model", {"w": jnp.zeros(1)}, apply)
        return InstanceRenderer(
            instancer_config=inst, model=model, n_samples=32, step_size=0.1,
            render_chunk=64, sample_budget_per_ray=0, sorted_blocks=sorted_blocks,
        )

    idx = np.arange(64)
    rays_o = np.stack(
        [(idx % 8 - 3.5) * 0.45, (idx // 8 - 3.5) * 0.45, np.full(64, 6.0)], -1
    ).astype(np.float32)
    data = dict(
        rays_o=rays_o[None],
        rays_d=np.tile(np.array([0, 0, -1.0], np.float32), (1, 64, 1)),
        t=np.tile([1.0, 9.0], (1, 64, 1)).astype(np.float32),
        parameters=np.zeros((1, 0), np.float32),
        cone_scale=np.full((1, 64, 1), 0.01, np.float32),
    )
    outs = {}
    for sb in (False, True):
        out = build(sb)(**data, training=False, key=jax.random.key(3))
        outs[sb] = (
            np.asarray(out["color_pred"])[0], np.asarray(out["alpha_pred"])[0]
        )
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-7)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=5e-7)
    assert outs[True][1].max() > 0.3


def test_selk_barrier_bitexact(monkeypatch):
    """NERFTEX_SELK_BARRIER=1 inserts optimization_barriers inside the
    overlap-resolution chain (after the fallback-merged `active`, after
    `dist`, after `w`) — pure fusion-boundary hints, value-identity by
    construction, so the frame must be bit-identical with the gate on or
    off (nearest_blend + shadows exercises every barrier site)."""
    import jax

    from nerftex_tpu.instancing import device as device_mod

    data = _ray_batch()
    data["parameters"] = np.array([[1, 1, 1, 0.1, 0, 0, -1.0]], np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_SELK_BARRIER", flag)
        r = _three_box_renderer(
            True, textures=("", "", "", "", "light"), cast_shadow_rays=True,
            instance_sampling_method="nearest_blend",
        )
        out = r(**data, training=False, key=jax.random.key(7))
        outs[flag] = {k: np.asarray(v) for k, v in out.items()}
    for k in sorted(outs[True]):
        assert np.array_equal(outs[True][k], outs[False][k], equal_nan=True), k
    assert outs[True]["alpha_pred"].max() > 0.3
