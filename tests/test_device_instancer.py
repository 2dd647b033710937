import os

import numpy as np
import jax
import pytest

from nerftex_tpu.instancing.scene import Scene
from nerftex_tpu.instancing.device import DeviceInstancer
from nerftex_tpu.instancing import oracle
from nerftex_tpu.tools import gen_assets


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


def _simple_scene(**kwargs):
    scene = Scene(b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5], **kwargs)
    return scene


def _down_rays(n=4, z=5.0, spread=0.3, seed=0):
    rs = np.random.RandomState(seed)
    rays_o = np.concatenate(
        [rs.uniform(-spread, spread, (n, 2)), np.full((n, 1), z)], -1
    ).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    return rays_o, rays_d


def _compare(scene, rays_o, rays_d, params, n_samples, step, atol=1e-4):
    """Device vs oracle on the RNG-independent outputs."""
    dev = DeviceInstancer(scene, max_hits=8, ray_block=4)
    out_d = {k: np.asarray(v) for k, v in dev.get_model_input(
        rays_o, rays_d, params, n_samples, step).items()}
    out_o = oracle.get_model_input(scene, rays_o, rays_d, params, n_samples, step)

    np.testing.assert_array_equal(out_d["hit"], out_o["hit"])
    # dists layout is offset-independent.
    np.testing.assert_allclose(out_d["dists"], out_o["dists"], atol=atol)
    np.testing.assert_allclose(out_d["alpha_last"], out_o["alpha_last"], atol=atol)
    np.testing.assert_allclose(out_d["color_last"], out_o["color_last"], atol=atol)
    # t grids differ only by the random offset (same spacing & segment
    # structure): compare the arc-structure by re-basing to the first sample.
    for r in range(rays_o.shape[0]):
        nd = int((out_d["dists"][r] > 0).sum())
        no = int((out_o["dists"][r] > 0).sum())
        assert nd == no
        if nd > 1:
            np.testing.assert_allclose(
                np.diff(out_d["t"][r, :nd]) , np.diff(out_o["t"][r, :no]), atol=atol
            )
    return out_d, out_o


def test_onehot_pick_is_bitwise_exact_gather():
    """The fused one-hot selection used throughout the grid path must be
    bitwise identical to the take_along_axis gather it replaces (x + 0 == x
    in IEEE; exactly one nonzero term per row)."""
    import jax.numpy as jnp
    from nerftex_tpu.instancing.device import _onehot_pick, _onehot_pick1

    rs = np.random.RandomState(3)
    R, S, K, D = 5, 17, 8, 6
    table = jnp.asarray(rs.randn(R, K, D).astype(np.float32) * 1e3)
    sel = jnp.asarray(rs.randint(0, K, (R, S)))
    oh = sel[..., None] == jnp.arange(K)[None, None, :]

    got = np.asarray(_onehot_pick(oh, table))
    # Reference gather: per (r,s) row sel[r,s] of table[r].
    want = np.stack([np.asarray(table)[r, np.asarray(sel)[r]] for r in range(R)])
    np.testing.assert_array_equal(got, want)

    vec = jnp.asarray(rs.randn(R, K).astype(np.float32))
    got1 = np.asarray(_onehot_pick1(oh, vec))
    want1 = np.stack([np.asarray(vec)[r, np.asarray(sel)[r]] for r in range(R)])
    np.testing.assert_array_equal(got1, want1)

    ints = jnp.asarray(rs.randint(-900, 900, (R, K)).astype(np.int32))
    goti = np.asarray(_onehot_pick1(oh, ints))
    wanti = np.stack([np.asarray(ints)[r, np.asarray(sel)[r]] for r in range(R)])
    np.testing.assert_array_equal(goti, wanti)


def test_device_matches_oracle_single_box():
    scene = _simple_scene()
    scene.add_instance(np.eye(4, dtype=np.float32))
    rays_o, rays_d = _down_rays(4)
    _compare(scene, rays_o, rays_d, np.zeros((4, 0), np.float32), 64, 0.05)


def test_device_matches_oracle_disjoint_boxes():
    scene = _simple_scene()
    for dz in (0.0, 2.0, 3.5):
        m = np.eye(4, dtype=np.float32)
        m[2, 3] = dz
        scene.add_instance(m)
    rays_o, rays_d = _down_rays(6)
    out_d, out_o = _compare(scene, rays_o, rays_d, np.zeros((6, 0), np.float32), 128, 0.05)
    # Instance assignment is deterministic here (no overlaps): must agree.
    for r in range(6):
        n = int((out_d["dists"][r] > 0).sum())
        # Same multiset of instance ids in the same order up to offset shift.
        ids_d = out_d["instance_id"][r, :n]
        ids_o = out_o["instance_id"][r, :n]
        assert abs((ids_d == 2).sum() - (ids_o == 2).sum()) <= 1
        assert abs((ids_d == 0).sum() - (ids_o == 0).sum()) <= 1


def test_device_matches_oracle_rotated_instances():
    scene = _simple_scene()
    rs = np.random.RandomState(5)
    for i in range(5):
        # Random rotation + translation, scaled.
        q = rs.randn(3, 3)
        u, _, vt = np.linalg.svd(q)
        rot = (u @ vt) * 0.4
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot
        m[:3, 3] = rs.uniform(-1, 1, 3)
        scene.add_instance(m)
    rays_o, rays_d = _down_rays(8, spread=0.8, seed=2)
    out_d, out_o = _compare(scene, rays_o, rays_d, np.zeros((8, 0), np.float32), 96, 0.03)

    # Local points must lie inside the unit patch box.
    for r in range(8):
        n = int((out_d["dists"][r] > 0).sum())
        pts = out_d["pts"][r, :n]
        assert np.all(pts >= scene.b_0 - 1e-3) and np.all(pts <= scene.b_1 + 1e-3)


def test_device_overlap_weights_random():
    scene = _simple_scene(instance_sampling_method="random")
    scene.add_instance(np.eye(4, dtype=np.float32))
    scene.add_instance(np.eye(4, dtype=np.float32))
    rays_o, rays_d = _down_rays(4)
    dev = DeviceInstancer(scene, max_hits=4, ray_block=4)
    out = {k: np.asarray(v) for k, v in dev.get_model_input(
        rays_o, rays_d, np.zeros((4, 0), np.float32), 32, 0.1).items()}
    for r in range(4):
        n = int((out["dists"][r] > 0).sum())
        np.testing.assert_allclose(out["alpha_weight"][r, :n], 2.0)
        assert set(np.unique(out["instance_id"][r, :n])) <= {0, 1}
    # Random selection actually mixes instances across samples.
    all_ids = out["instance_id"][out["dists"] > 0]
    assert len(np.unique(all_ids)) == 2


def test_device_nearest_blend_weights():
    scene = _simple_scene(instance_sampling_method="nearest_blend")
    m2 = np.eye(4, dtype=np.float32)
    m2[0, 3] = 0.3  # overlapping, different origins
    scene.add_instance(np.eye(4, dtype=np.float32))
    scene.add_instance(m2)
    rays_o = np.array([[0.15, 0, 5.0]], np.float32)
    rays_d = np.array([[0, 0, -1.0]], np.float32)
    dev = DeviceInstancer(scene, max_hits=4, ray_block=1)
    out = {k: np.asarray(v) for k, v in dev.get_model_input(
        rays_o, rays_d, np.zeros((1, 0), np.float32), 32, 0.05).items()}
    n = int((out["dists"][0] > 0).sum())
    w = out["alpha_weight"][0, :n]
    assert np.all(w >= 1.0 - 1e-5)  # 1/p >= 1


def test_device_use_mean_distance():
    """use_mean_distance applies the cone mean-distance correction
    (instancer.cpp:746-748, 874-878) to sample t (points shift along the ray)
    while leaving the arc structure (dists) untouched."""
    step = 0.05
    outs = {}
    for flag in (False, True):
        scene = _simple_scene(use_mean_distance=flag)
        scene.add_instance(np.eye(4, dtype=np.float32))
        dev = DeviceInstancer(scene, max_hits=4, ray_block=4)
        rays_o, rays_d = _down_rays(4)
        outs[flag] = {k: np.asarray(v) for k, v in dev.get_model_input(
            rays_o, rays_d, np.zeros((4, 0), np.float32), 64, step,
            key=jax.random.PRNGKey(7)).items()}

    base, corr = outs[False], outs[True]
    # The reference stores the *uncorrected* t_mu in the t buffer and only
    # shifts the sample point (instancer.cpp:880-886): t and dists unchanged.
    np.testing.assert_allclose(base["dists"], corr["dists"], atol=1e-6)
    np.testing.assert_allclose(base["t"], corr["t"], atol=1e-6)
    valid = base["dists"] > 0
    mu = base["t"][valid]
    t_pt = mu + 2 * mu * step**2 / (3 * mu**2 + step**2)
    # Identity instance + straight-down rays: local z = o_z - t_pt.
    rays_o, _ = _down_rays(4)
    o_z = np.broadcast_to(rays_o[:, None, 2], base["t"].shape)[valid]
    np.testing.assert_allclose(corr["pts"][valid][:, 2], o_z - t_pt, rtol=1e-4)
    np.testing.assert_allclose(base["pts"][valid][:, 2], o_z - mu, rtol=1e-4)

    # Oracle agrees on the corrected spacing structure.
    scene = _simple_scene(use_mean_distance=True)
    scene.add_instance(np.eye(4, dtype=np.float32))
    rays_o, rays_d = _down_rays(4)
    _compare(scene, rays_o, rays_d, np.zeros((4, 0), np.float32), 64, step,
             atol=2e-3)


def test_device_mesh_terminator(assets):
    from nerftex_tpu.instancing.scene import SceneMesh

    scene = _simple_scene()
    scene.add_instance(np.eye(4, dtype=np.float32))
    V = np.array([[-5, -5, -2], [5, -5, -2], [5, 5, -2], [-5, 5, -2]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    scene.base_mesh = SceneMesh(V, F)
    rays_o, rays_d = _down_rays(4)
    out_d, out_o = _compare(scene, rays_o, rays_d, np.zeros((4, 0), np.float32), 64, 0.05)
    assert np.all(out_d["alpha_last"] == 1.0)


def test_device_shadowing_matches_oracle():
    scene = _simple_scene(cast_shadow_rays=True, textures=["light"])
    scene.add_instance(np.eye(4, dtype=np.float32))
    blocker = np.eye(4, dtype=np.float32)
    blocker[2, 3] = 3.0
    scene.add_instance(blocker)

    rays_o = np.array([[5.0, 0, 0], [5.0, 2.0, 0]], np.float32)  # 2nd misses blocker in y
    rays_d = np.tile(np.array([-1.0, 0, 0], np.float32), (2, 1))
    params = np.tile(np.array([0, 0, 1.0], np.float32), (2, 1))

    dev = DeviceInstancer(scene, max_hits=4, ray_block=2)
    out = {k: np.asarray(v) for k, v in dev.get_model_input(rays_o, rays_d, params, 32, 0.1).items()}
    n0 = int((out["dists"][0] > 0).sum())
    np.testing.assert_allclose(
        out["parameters"][0, :n0, :3], np.tile([0, 0, -1.0], (n0, 1)), atol=1e-5
    )
    # Ray 2 passes beside both boxes -> no samples, ok either way.


def test_device_point_light_strength():
    scene = _simple_scene(textures=["point"])
    scene.add_instance(np.eye(4, dtype=np.float32))
    rays_o, rays_d = _down_rays(1, spread=0.0)
    # params: [strength, light_pos x3]
    params = np.array([[10.0, 0, 0, 3.0]], np.float32)
    dev = DeviceInstancer(scene, max_hits=4, ray_block=1)
    out = {k: np.asarray(v) for k, v in dev.get_model_input(rays_o, rays_d, params, 32, 0.1).items()}
    n = int((out["dists"][0] > 0).sum())
    # Falloff strength = 10 / (4 pi d^2); sample z in [-0.5, 0.5], light at z=3.
    t = out["t"][0, :n]
    z = 5.0 - t
    expected = 10.0 / (4 * np.pi * (3.0 - z) ** 2 + 1e-6)
    np.testing.assert_allclose(out["parameters"][0, :n, 0], expected, rtol=1e-4)
    # Light direction slots point from sample toward the light (normalized, local=world identity frame).
    vec = np.stack([np.zeros_like(z), np.zeros_like(z), 3.0 - z], -1)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    np.testing.assert_allclose(out["parameters"][0, :n, 1:4], vec, atol=1e-5)


def test_device_texture_parameters(assets):
    scene = Scene(
        b_0=[-1.4, -1.2, -0.1],
        b_1=[1.2, 1.2, 1.8],
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
        instance_sampling_method="nearest",
        seed=0,
    )
    scene.distribute_instances_on_mesh(
        os.path.join(assets, "cloth_mesh.ply"), 0.09,
        os.path.join(assets, "cloth_anchor_points.ply"),
    )
    rs = np.random.RandomState(0)
    n_rays = 8
    rays_o = np.concatenate([rs.uniform(-0.5, 0.5, (n_rays, 2)), np.full((n_rays, 1), 4.0)], -1).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    params = np.tile(np.array([1.0, 1, 1, 0.1, 0, 0, -1.0], np.float32), (n_rays, 1))

    dev = DeviceInstancer(scene, max_hits=32, ray_block=8)
    out = {k: np.asarray(v) for k, v in dev.get_model_input(rays_o, rays_d, params, 128, 0.02).items()}
    assert out["hit"].any()
    got_samples = False
    for r in range(n_rays):
        n = int((out["dists"][r] > 0).sum())
        if n == 0:
            continue
        got_samples = True
        tex_vals = out["parameters"][r, :n, 0]
        # Texture-scaled slot 0 stays in the smooth checkerboard's range.
        assert np.all(tex_vals >= 0.0) and np.all(tex_vals <= 1.0)
        # Spatial variation across the scene (not all identical).
    assert got_samples

    # Compare a handful of samples against the oracle's exact closest-point
    # lookup (candidate-triangle approximation should be tight on the cloth).
    r = int(np.argmax([(out["dists"][i] > 0).sum() for i in range(n_rays)]))
    n = int((out["dists"][r] > 0).sum())
    errs = []
    for i in range(0, n, max(1, n // 8)):
        t = out["t"][r, i]
        pt = rays_o[r] + t * rays_d[r]
        exact = scene.get_parameters(pt, params[r])
        errs.append(abs(float(out["parameters"][r, i, 0]) - float(exact[0])))
    # Jacobian-linearized UV vs exact closest point: tight on the smooth
    # checkerboard, bounded by local curvature.
    assert np.mean(errs) < 0.06, errs
    assert np.max(errs) < 0.25, errs


def test_device_cloth_scene_smoke(assets):
    """Full cloth scene: 64 rays from the config camera; sane outputs."""
    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np

    inst = Instancer(
        b_0=[-1.4, -1.2, -0.1],
        b_1=[1.2, 1.2, 1.8],
        cast_shadow_rays=False,
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
        mesh_path=os.path.join(assets, "cloth_mesh.ply"),
        patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
        patch_scale=0.09,
        jitter_amount=1.0,
        instance_sampling_method="nearest",
        max_hits=32,
        ray_block=64,
    )
    assert inst.n_instances() == 900

    h = w = 8
    focal = w / np.tan(0.55 / 2) / 2
    c2w = look_at_np(np.array([0.47, -0.65, 0.6]) * 6.0)
    idx = np.arange(h * w)
    loc = np.stack([idx // w, idx % w], -1).astype(np.float32)
    rays_o, rays_d, _ = rays_from_camera_np(loc, h, w, focal, c2w)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    params = np.tile(np.array([1, 1, 1, 0.1, 0, 0, 1.0], np.float32), (h * w, 1))

    outs = inst.get_model_input(rays_o, rays_d, params, 256, 0.002)
    rays_d_m, pts, t, dists, color_last, alpha_last, alpha_weight, instance_id, hit_idxs, params_m = outs
    pts = np.asarray(pts)
    dists = np.asarray(dists)
    assert len(np.asarray(hit_idxs)) > 0
    valid = dists > 0
    assert valid.any()
    # Local points inside the patch box.
    inside = (pts[valid] >= inst.scene.b_0 - 1e-3) & (pts[valid] <= inst.scene.b_1 + 1e-3)
    assert inside.all()
    # Local dirs unit-norm.
    d = np.asarray(rays_d_m)[valid]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_aux_mesh_terminator_shading_matches_oracle(assets):
    """Auxiliary mesh behind the patch: device Lambert+ambient terminator
    shading (textured albedo) matches the numpy oracle."""
    from nerftex_tpu.instancing.scene import SceneMesh

    scene = Scene(
        b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5], textures=["light"]
    )
    scene.add_instance(np.eye(4, dtype=np.float32))
    # Base mesh far below (never hit), aux floor at z=-2 with a texture.
    scene.base_mesh = SceneMesh(
        np.array([[-9, -9, -9], [9, -9, -9], [9, 9, -9], [-9, 9, -9]], np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    scene.add_mesh(os.path.join(assets, "cloth_mesh.ply"),
                   os.path.join(assets, "checkerboard.png"))
    # Shift the aux mesh down so the ray exits the patch first.
    scene.aux_meshes[0].V[:, 2] -= 2.0

    rays_o = np.array([[0.1, 0.05, 5.0], [-0.2, 0.1, 5.0]], np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (2, 1))
    params = np.tile(np.array([0, 0, 1.0], np.float32), (2, 1))

    dev = DeviceInstancer(scene, max_hits=4, ray_block=2)
    out_d = {k: np.asarray(v) for k, v in dev.get_model_input(
        rays_o, rays_d, params, 32, 0.1).items()}
    out_o = oracle.get_model_input(scene, rays_o, rays_d, params, 32, 0.1)

    np.testing.assert_allclose(out_d["alpha_last"], out_o["alpha_last"], atol=1e-5)
    np.testing.assert_allclose(out_d["color_last"], out_o["color_last"], atol=2e-2)
    assert out_d["color_last"].max() > 0.05  # actually shaded, not black


def _pinhole_block(n=64, seed=3):
    """A camera-coherent ray block (the culling bound's intended shape)."""
    rs = np.random.RandomState(seed)
    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np

    pose = look_at_np(np.array([0.6, -0.8, 0.7]) * 4.0)
    w = 16
    idx = np.arange(n)
    loc = np.stack([idx // w, idx % w], -1).astype(np.float32)
    rays_o, rays_d, _ = rays_from_camera_np(loc, n // w, w, 24.0, pose)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def test_cull_candidates_conservative():
    """Every instance whose slab test intersects any ray of a coherent block
    must be in the candidate set (the conservativeness the bit-exactness
    claim rests on)."""
    rs = np.random.RandomState(0)
    scene = _simple_scene()
    for _ in range(40):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = rs.uniform(-1.5, 1.5, 3)
        ang = rs.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        m[:2, :2] = np.array([[c, -s], [s, c]], np.float32) * rs.uniform(0.2, 0.5)
        m[2, 2] = rs.uniform(0.2, 0.5)
        scene.add_instance(m)
    dev = DeviceInstancer(scene, max_hits=8, ray_block=64, cull_budget=40)

    rays_o, rays_d = _pinhole_block()
    cand, valid, dropped = dev._cull_candidates(rays_o, rays_d, 40)
    cand_set = set(np.asarray(cand)[np.asarray(valid)].tolist())
    assert int(dropped) == 0

    import jax.numpy as jnp

    ds = dev.ds
    t0 = jnp.full((64, ds.n_instances), -jnp.inf)
    t1 = jnp.full((64, ds.n_instances), jnp.inf)
    for c in range(3):
        o_lc = rays_o @ np.asarray(ds.inv_rot)[:, c, :].T + np.asarray(ds.inv_trans)[:, c]
        d_lc = rays_d @ np.asarray(ds.inv_rot)[:, c, :].T
        inv_dl = 1.0 / np.where(np.abs(d_lc) < 1e-12, 1e-12, d_lc)
        t_a = (float(ds.b_0[c]) - o_lc) * inv_dl
        t_b = (float(ds.b_1[c]) - o_lc) * inv_dl
        t0 = np.maximum(t0, np.minimum(t_a, t_b))
        t1 = np.minimum(t1, np.maximum(t_a, t_b))
    really_hit = np.nonzero(((t0 < t1) & (t1 > 0)).any(0))[0]
    missing = [i for i in really_hit.tolist() if i not in cand_set]
    assert not missing, f"cull dropped truly-hit instances {missing}"


def test_cull_budget_bitexact_when_covering(assets):
    """With a budget covering every candidate, the culled per-ray pipeline is
    bit-identical to the uncull path on the full instanced scene."""
    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.utils import rng

    def build(cull):
        rng.set_seed(0)
        return Instancer(
            b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
            mesh_path=os.path.join(assets, "cloth_mesh.ply"),
            patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
            patch_scale=0.09, jitter_amount=1.0,
            textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            instance_sampling_method="nearest",
            max_hits=16, ray_block=64, cull_budget=cull,
        )

    rays_o, rays_d = _pinhole_block(n=128)
    prm = np.tile(np.float32([1, 1, 1, 0.1, 0, 0, 1]), (128, 1))
    key = jax.random.key(11)
    n = build(0).n_instances()
    oa = build(0).get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=key)
    # Budget n-1 is strictly below n_instances, so the cull branch is
    # actually taken (device.py guard: max(C, K) < n_instances) — budget n
    # would silently fall back to the uncull path and compare it to itself.
    ob = build(n - 1).get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=key)
    # The bit-exactness premise — the budget covers every per-block
    # candidate — is checked, not assumed.
    assert int(ob["overflow_cull"]) == 0, "cull budget n-1 dropped candidates"
    for k in sorted(oa):
        if k == "overflow_cull":
            continue
        va, vb = np.asarray(oa[k]), np.asarray(ob[k])
        assert np.array_equal(va, vb, equal_nan=True), f"{k} differs under culling"


def test_tri_cull_budget_bitexact_when_covering(assets):
    """Triangle-soup culling with a covering budget leaves the mesh
    first-hit (terminator) results equivalent: discrete outputs exact,
    floats within f32-epsilon compile variance."""
    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.utils import rng

    def build(tri_cull):
        rng.set_seed(0)
        return Instancer(
            b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
            mesh_path=os.path.join(assets, "cloth_mesh.ply"),
            patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
            patch_scale=0.09, jitter_amount=1.0,
            textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            instance_sampling_method="nearest",
            max_hits=16, ray_block=64, tri_cull_budget=tri_cull,
        )

    rays_o, rays_d = _pinhole_block(n=128)
    prm = np.tile(np.float32([1, 1, 1, 0.1, 0, 0, 1]), (128, 1))
    key = jax.random.key(5)
    n_tris = build(0).device.ds.n_tris
    oa = build(0).get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=key)
    # n_tris - 1 is strictly below the guard (device.py: TC < ds.n_tris), so
    # the tri-cull branch actually runs; zero drops checks the covering
    # premise instead of assuming it.
    ob = build(n_tris - 1).get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=key)
    assert int(ob["overflow_cull"]) == 0, "tri cull budget n-1 dropped candidates"
    for k in sorted(oa):
        if k == "overflow_cull":
            continue
        va, vb = np.asarray(oa[k]), np.asarray(ob[k])
        if va.dtype.kind == "f":
            # Moller-Trumbore over the gathered [R, TC] candidate subset can
            # compile with different fma contraction than the full [R, n_tris]
            # layout, perturbing t_mesh at f32-epsilon scale (observed: 4 of
            # 128*48 dists entries off by <= 5e-7).  Discrete outputs
            # (instance ids, hit masks) below must still match exactly.
            np.testing.assert_allclose(
                np.nan_to_num(va), np.nan_to_num(vb), atol=1e-6, rtol=1e-5,
                err_msg=f"{k} differs under tri culling",
            )
        else:
            assert np.array_equal(va, vb), f"{k} differs under tri culling"


def test_shadow_cull_bitexact_when_covering(assets):
    """Shadow-pass culling (device.py::_occlusion_branched swept-cone
    bound): any budget is exact by construction (the culled branch is only
    taken when the keep sets fit), so outputs must be bit-identical to the
    budget-off build."""
    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.utils import rng

    def build(sc, stc):
        rng.set_seed(0)
        return Instancer(
            b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
            mesh_path=os.path.join(assets, "cloth_mesh.ply"),
            patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
            patch_scale=0.09, jitter_amount=1.0, cast_shadow_rays=True,
            textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            instance_sampling_method="nearest",
            max_hits=16, ray_block=64, shadow_samples=8,
            shadow_cull_budget=sc, shadow_tri_cull_budget=stc,
        )

    rays_o, rays_d = _pinhole_block(n=128)
    prm = np.tile(np.float32([1, 1, 1, 0.1, 0, 0, 1]), (128, 1))
    key = jax.random.key(3)
    ref = build(0, 0)
    n, n_tris = ref.n_instances(), ref.device.ds.n_tris
    oa = ref.get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=key)
    # Budgets strictly below n/n_tris so the shadow-cull branch actually
    # runs (device.py guards C < n_instances / TC < n_tris); zero drops
    # checks the covering premise instead of assuming it.
    ob = build(n - 1, n_tris - 1).get_model_input_dict(
        rays_o, rays_d, prm, 48, 0.02, key=key
    )
    assert int(ob["overflow_cull"]) == 0
    for k in sorted(oa):
        if k == "overflow_cull":
            continue
        va, vb = np.asarray(oa[k]), np.asarray(ob[k])
        assert np.array_equal(va, vb, equal_nan=True), f"{k} differs under shadow culling"


def test_shadow_cull_exact_even_undersized(assets):
    """An under-sized shadow budget falls back to the full query per block
    (exact, zero drops) instead of dropping occluders."""
    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.utils import rng

    rng.set_seed(0)
    inst = Instancer(
        b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
        mesh_path=os.path.join(assets, "cloth_mesh.ply"),
        patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
        patch_scale=0.09, jitter_amount=1.0, cast_shadow_rays=True,
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
        instance_sampling_method="nearest",
        max_hits=16, ray_block=64, shadow_samples=8,
        shadow_cull_budget=2,
    )
    rays_o, rays_d = _pinhole_block(n=128)
    prm = np.tile(np.float32([1, 1, 1, 0.1, 0, 0, 1]), (128, 1))
    out = inst.get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=jax.random.key(3))
    assert int(out["overflow_cull"]) == 0

    from nerftex_tpu.utils import rng as _rng

    _rng.set_seed(0)
    ref = Instancer(
        b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
        mesh_path=os.path.join(assets, "cloth_mesh.ply"),
        patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
        patch_scale=0.09, jitter_amount=1.0, cast_shadow_rays=True,
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
        instance_sampling_method="nearest",
        max_hits=16, ray_block=64, shadow_samples=8,
    ).get_model_input_dict(rays_o, rays_d, prm, 48, 0.02, key=jax.random.key(3))
    for k in sorted(ref):
        va, vb = np.asarray(ref[k]), np.asarray(out[k])
        assert np.array_equal(va, vb, equal_nan=True), f"{k} differs with tiny shadow budget"


def test_packed_inst_gather_bitexact_vs_piecewise(assets, monkeypatch):
    """The packed per-instance table gather (docs/PERF.md §2.9) is a pure
    layout change: flipping NERFTEX_PACKED_GATHER back to the piecewise
    per-column gathers must reproduce every output bit-for-bit on both the
    grid and the compacted sampling paths (jacobian texturing active so the
    full packed column set is exercised)."""
    from nerftex_tpu.instancing import device as device_mod

    def build():
        scene = Scene(
            b_0=[-1.4, -1.2, -0.1],
            b_1=[1.2, 1.2, 1.8],
            textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            instance_sampling_method="nearest",
            seed=0,
        )
        scene.distribute_instances_on_mesh(
            os.path.join(assets, "cloth_mesh.ply"), 0.09,
            os.path.join(assets, "cloth_anchor_points.ply"),
        )
        return DeviceInstancer(scene, max_hits=16, ray_block=8, shadow_samples=8)

    rs = np.random.RandomState(3)
    n_rays = 8
    rays_o = np.concatenate(
        [rs.uniform(-0.5, 0.5, (n_rays, 2)), np.full((n_rays, 1), 4.0)], -1
    ).astype(np.float32)
    rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    params = np.tile(np.array([1.0, 1, 1, 0.1, 0, 0, -1.0], np.float32), (n_rays, 1))

    results = {}
    for packed in (True, False):
        monkeypatch.setattr(device_mod, "_PACKED_GATHER", packed)
        dev = build()  # fresh instancer: fresh jit + packed caches
        grid = dev.get_model_input(
            rays_o, rays_d, params, 64, 0.02, key=jax.random.key(1)
        )
        comp = dev.get_model_input_compact(
            rays_o, rays_d, params, 64, 0.02, 48, key=jax.random.key(1)
        )
        results[packed] = (
            {k: np.asarray(v) for k, v in grid.items()},
            {k: np.asarray(v) for k, v in comp.items()},
        )

    for path_idx, name in ((0, "grid"), (1, "compact")):
        a, b = results[True][path_idx], results[False][path_idx]
        assert sorted(a) == sorted(b)
        for k in sorted(a):
            assert np.array_equal(a[k], b[k], equal_nan=True), f"{name}/{k}"


def test_topk_select_bitexact_vs_sort(monkeypatch):
    """The interval top-K via lax.top_k + fused one-hot selects (docs/PERF.md
    §2.10) must reproduce the stable multi-operand sort bit-for-bit —
    including exact t0 ties (identical stacked instances) and the culled
    candidate branch (non-trivial inst_ids)."""
    from nerftex_tpu.instancing import device as device_mod

    scene = _simple_scene(seed=0)
    rs = np.random.RandomState(7)
    # Three IDENTICAL instances (exact t0/t1 ties: tie order must match) +
    # a stack of shifted/rotated ones so K=4 < n_instances truncates.
    for _ in range(3):
        scene.add_instance(np.eye(4, dtype=np.float32))
    for i in range(9):
        q = rs.randn(3, 3)
        u, _, vt = np.linalg.svd(q)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = (u @ vt) * 0.5
        m[:3, 3] = [rs.uniform(-0.3, 0.3), rs.uniform(-0.3, 0.3), 0.4 * i]
        scene.add_instance(m)

    rays_o, rays_d = _down_rays(16, z=6.0, spread=0.4, seed=3)
    prm = np.zeros((16, 0), np.float32)

    results = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_TOPK_SELECT", flag)
        outs = []
        for cull in (0, 8):  # full branch and culled-candidate branch
            dev = DeviceInstancer(scene, max_hits=4, ray_block=8, cull_budget=cull)
            out = dev.get_model_input(rays_o, rays_d, prm, 64, 0.05, key=jax.random.key(2))
            outs.append({k: np.asarray(v) for k, v in out.items()})
        results[flag] = outs

    for i, name in enumerate(("full", "culled")):
        a, b = results[True][i], results[False][i]
        assert sorted(a) == sorted(b)
        for k in sorted(a):
            assert np.array_equal(a[k], b[k], equal_nan=True), f"{name}/{k}"


def test_event_cumsum_bitexact_vs_compare_all(monkeypatch):
    """The sort-carried +-1 prefix count (docs/PERF.md §2.10) must produce
    outputs bit-identical to the O(K^2) compare-all event counting —
    including exact shared boundaries (abutting and identical instances,
    where event-time ties exercise the differing within-tie counts whose
    gap==0 makes them unobservable)."""
    from nerftex_tpu.instancing import device as device_mod

    scene = _simple_scene(seed=0)
    # Identical instances (fully tied events), an abutting stack (end == next
    # start exactly: box height 1 at z offsets 0/1/2), and rotated ones.
    rs = np.random.RandomState(11)
    for _ in range(2):
        scene.add_instance(np.eye(4, dtype=np.float32))
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[2, 3] = float(i)
        scene.add_instance(m)
    for i in range(6):
        q = rs.randn(3, 3)
        u, _, vt = np.linalg.svd(q)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = (u @ vt) * 0.6
        m[:3, 3] = [rs.uniform(-0.2, 0.2), rs.uniform(-0.2, 0.2), 0.7 * i]
        scene.add_instance(m)

    rays_o, rays_d = _down_rays(16, z=7.0, spread=0.3, seed=5)
    prm = np.zeros((16, 0), np.float32)

    results = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_EVENT_CUMSUM", flag)
        dev = DeviceInstancer(scene, max_hits=8, ray_block=8)
        out = dev.get_model_input(rays_o, rays_d, prm, 96, 0.04, key=jax.random.key(4))
        results[flag] = {k: np.asarray(v) for k, v in out.items()}

    a, b = results[True], results[False]
    assert sorted(a) == sorted(b)
    for k in sorted(a):
        assert np.array_equal(a[k], b[k], equal_nan=True), f"{k}"


def test_select_coefs_bitexact(monkeypatch):
    """Folding the anchor-distance coefficients through the top-K one-hot
    (NERFTEX_SELECT_COEFS=1) must be bit-identical to the gathered form on
    both the full and culled candidate branches."""
    from nerftex_tpu.instancing import device as device_mod

    # Premise (vacuousness trap): the fold activates only with the top-K
    # select path on and a non-random sampling method — force it on so the
    # test also holds under a NERFTEX_TOPK_SELECT=0 environment.
    monkeypatch.setattr(device_mod, "_TOPK_SELECT", True)
    scene = _simple_scene(seed=0, instance_sampling_method="nearest")
    rs = np.random.RandomState(13)
    for i in range(10):
        q = rs.randn(3, 3)
        u, _, vt = np.linalg.svd(q)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = (u @ vt) * 0.5
        m[:3, 3] = [rs.uniform(-0.3, 0.3), rs.uniform(-0.3, 0.3), 0.45 * i]
        scene.add_instance(m)

    rays_o, rays_d = _down_rays(16, z=6.0, spread=0.4, seed=9)
    prm = np.zeros((16, 0), np.float32)

    results = {}
    for flag in (True, False):
        monkeypatch.setattr(device_mod, "_SELECT_COEFS", flag)
        outs = []
        for cull in (0, 6):
            dev = DeviceInstancer(scene, max_hits=4, ray_block=8, cull_budget=cull)
            out = dev.get_model_input(rays_o, rays_d, prm, 64, 0.05, key=jax.random.key(6))
            outs.append({k: np.asarray(v) for k, v in out.items()})
        results[flag] = outs

    for i, name in enumerate(("full", "culled")):
        a, b = results[True][i], results[False][i]
        assert sorted(a) == sorted(b)
        for k in sorted(a):
            assert np.array_equal(a[k], b[k], equal_nan=True), f"{name}/{k}"


def test_compact_capacity_guard():
    """An over-budget compact request must fail with an actionable message
    BEFORE tracing/compiling (the round-3 harness hit a 21.5 GB lane-padded
    alloc at chunk 262144, commit 3403a68)."""
    from nerftex_tpu.instancing.device import _check_compact_capacity

    scene = _simple_scene(seed=0)
    scene.add_instance(np.eye(4, dtype=np.float32))
    dev = DeviceInstancer(scene, max_hits=4, ray_block=1024)
    rays_o, rays_d = _down_rays(1024)
    prm = np.zeros((1024, 0), np.float32)
    with pytest.raises(ValueError, match="compact-path capacity"):
        dev.get_model_input_compact(rays_o, rays_d, prm, 64, 0.05, 65536)
    # The round-3 failure point itself: 262144 rays x budget 160.
    with pytest.raises(ValueError, match="lane-pad"):
        _check_compact_capacity(262144, 160, 7)
    # Shipped-scale requests stay well under the cap.
    _check_compact_capacity(262144, 16, 7)
    _check_compact_capacity(4096, 512, 7)
