"""Occupancy-sorted bucketed render path (device.render_grid_sorted):
equivalence with the dense grid path and empty-block handling."""

import numpy as np
import pytest

from nerftex_tpu.utils import rng


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
