import os

import numpy as np
import pytest

from nerftex_tpu.instancing.ply import read_ply, write_ply
from nerftex_tpu.instancing.scene import (
    Scene,
    SceneMesh,
    closest_point_on_mesh,
    closest_point_triangles,
    sample_texture,
)
from nerftex_tpu.instancing import oracle
from nerftex_tpu.tools import gen_assets


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


def test_ply_roundtrip(tmp_path):
    V = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    F = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    N = np.tile([0, 0, 1.0], (10, 1)).astype(np.float32)
    UV = np.random.RandomState(1).rand(10, 2).astype(np.float32)
    for binary in (True, False):
        path = str(tmp_path / f"m_{binary}.ply")
        write_ply(path, V, F, N, UV, binary=binary)
        ply = read_ply(path)
        np.testing.assert_allclose(ply.V, V, atol=1e-5)
        np.testing.assert_array_equal(ply.F, F)
        np.testing.assert_allclose(ply.N, N, atol=1e-5)
        np.testing.assert_allclose(ply.UV, UV, atol=1e-5)


def test_ply_points_only(tmp_path):
    pts = np.random.RandomState(0).rand(7, 3).astype(np.float32)
    path = str(tmp_path / "pts.ply")
    write_ply(path, pts)
    ply = read_ply(path)
    np.testing.assert_allclose(ply.V, pts, atol=1e-6)
    assert len(ply.F) == 0


def test_generated_assets_load(assets):
    for name in ("cloth_mesh.ply", "terrain_mesh.ply", "stanford_bunny.ply"):
        ply = read_ply(os.path.join(assets, name))
        assert len(ply.V) > 100 and len(ply.F) > 100
        assert ply.N is not None and ply.UV is not None
        assert np.isfinite(ply.V).all()
    anchors = read_ply(os.path.join(assets, "cloth_anchor_points.ply"))
    assert len(anchors.V) == 900


def test_closest_point_triangle_against_bruteforce():
    rs = np.random.RandomState(3)
    for _ in range(50):
        a, b, c = rs.randn(3, 3).astype(np.float32)
        p = rs.randn(3).astype(np.float32)
        pts, bary = closest_point_triangles(p, a[None], b[None], c[None])
        # Dense barycentric sweep.
        u, v = np.meshgrid(np.linspace(0, 1, 60), np.linspace(0, 1, 60))
        mask = u + v <= 1
        u, v = u[mask], v[mask]
        grid = (1 - u - v)[:, None] * a + u[:, None] * b + v[:, None] * c
        d_brute = np.linalg.norm(grid - p, axis=-1).min()
        d_ours = np.linalg.norm(pts[0] - p)
        assert d_ours <= d_brute + 1e-3
        np.testing.assert_allclose(bary[0].sum(), 1.0, atol=1e-5)


def test_scene_placement_on_cloth(assets):
    scene = Scene(
        b_0=[-1.4, -1.2, -0.1],
        b_1=[1.2, 1.2, 1.8],
        textures=["", "", "", "", "light"],
        jitter_amount=1.0,
        instance_sampling_method="nearest",
        seed=0,
    )
    scene.distribute_instances_on_mesh(
        os.path.join(assets, "cloth_mesh.ply"),
        0.09,
        os.path.join(assets, "cloth_anchor_points.ply"),
    )
    assert scene.n_instances() == 900
    assert scene.patch_scale == 0.09
    assert scene.n_parameters == 7  # 4 scalar slots + light x3
    assert scene.light_dir_idx == 4

    fwd = np.asarray(scene.forward)
    inv = np.asarray(scene.inverse)
    # forward @ inverse = identity
    prod = np.einsum("nij,njk->nik", fwd, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (900, 1, 1)), atol=1e-3)
    # Rotation columns orthogonal with norm = patch_scale.
    cols = fwd[:, :3, :3]
    norms = np.linalg.norm(cols, axis=1)
    np.testing.assert_allclose(norms, 0.09, atol=1e-4)
    dots = np.einsum("nij,nij->nj", cols, np.roll(cols, 1, axis=2))
    np.testing.assert_allclose(dots, 0, atol=1e-4)
    # dir_inverse rows are the unit T/B/N frame.
    dinv = np.asarray(scene.dir_inverse)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", dinv, dinv), np.tile(np.eye(3), (900, 1, 1)), atol=1e-3
    )
    # Anchors sit on (near) the mesh surface.
    origins = np.asarray(scene.origins)
    sample = origins[::90]
    for p in sample:
        _, _, d = closest_point_on_mesh(p, scene.base_mesh)
        assert d < 0.05


def test_scene_vertex_placement_dedup(assets):
    scene = Scene(b_0=[-1, -1, -0.2], b_1=[1, 1, 1], seed=0)
    scene.distribute_instances_on_mesh(os.path.join(assets, "stanford_bunny.ply"), 0.04)
    ply = read_ply(os.path.join(assets, "stanford_bunny.ply"))
    n_unique = len({v.tobytes() for v in ply.V})
    assert scene.n_instances() == n_unique


def test_texture_slot_layout(assets):
    scene = Scene(
        b_0=[-1, -1, -1],
        b_1=[1, 1, 1],
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
    )
    assert scene.texture_parameter_idxs == [0]
    assert scene.n_parameters == 1 + 3 + 3  # 1 tex channel + 3 scalars + light
    assert scene.light_dir_idx == 4
    assert len(scene.texture_channels) == 1

    point_scene = Scene(b_0=[-1] * 3, b_1=[1] * 3, textures=["", "point"])
    assert point_scene.n_parameters == 5
    assert point_scene.light_strength_idx == 1
    assert point_scene.light_dir_idx == 2


def test_sample_texture_bilinear():
    channel = np.array([[0.0, 1.0], [0.0, 1.0]], np.float32)  # [W,H]: varies in v
    uv = np.array([[0.5, 0.5], [0.0, 0.0], [0.0, 1.0]], np.float32)
    out = sample_texture(channel, uv)
    np.testing.assert_allclose(out, [0.5, 0.0, 1.0], atol=1e-6)


def test_export_transformations(tmp_path, assets):
    import json

    scene = Scene(b_0=[-1] * 3, b_1=[1] * 3)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [1, 2, 3]
    scene.add_instance(m)
    path = str(tmp_path / "trafo.json")
    scene.export_transformations(path)
    loaded = np.asarray(json.load(open(path)))
    np.testing.assert_allclose(loaded[0], m, atol=1e-5)


def test_oracle_single_box_sampling():
    """One axis-aligned unit patch at the origin; ray straight through."""
    scene = Scene(b_0=[-0.5, -0.5, 0.0], b_1=[0.5, 0.5, 0.5])
    scene.add_instance(np.eye(4, dtype=np.float32))

    rays_o = np.array([[0, 0, 5.0]], np.float32)
    rays_d = np.array([[0, 0, -1.0]], np.float32)
    params = np.zeros((1, 0), np.float32)

    out = oracle.get_model_input(scene, rays_o, rays_d, params, 64, 0.05)
    assert out["hit"][0]
    # Segment is [4.5, 5.0] -> total 0.5 -> 10 steps of 0.05.
    n_valid = int((out["dists"][0] > 0).sum())
    assert n_valid == 10
    np.testing.assert_allclose(out["dists"][0, :9], 0.05, atol=1e-6)
    assert abs(out["dists"][0][:n_valid].sum() - 0.5) < 1e-5
    # t values advance by step inside the segment.
    t = out["t"][0, :n_valid]
    np.testing.assert_allclose(np.diff(t), 0.05, atol=1e-5)
    assert 4.5 <= t[0] < 4.55
    # Local pts equal world pts (identity transform).
    pts = out["pts"][0, :n_valid]
    np.testing.assert_allclose(pts[:, 2], 5.0 - t, atol=1e-5)
    assert np.all(np.abs(pts[:, :2]) < 1e-5)


def test_oracle_two_disjoint_boxes():
    scene = Scene(b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5])
    m1 = np.eye(4, dtype=np.float32)
    m2 = np.eye(4, dtype=np.float32)
    m2[2, 3] = 2.0  # second box centered at z=2
    scene.add_instance(m1)
    scene.add_instance(m2)

    rays_o = np.array([[0, 0, 5.0]], np.float32)
    rays_d = np.array([[0, 0, -1.0]], np.float32)
    out = oracle.get_model_input(scene, rays_o, rays_d, np.zeros((1, 0), np.float32), 128, 0.1)
    # Two unit-length segments: [2.5,3.5] (box2) and [4.5,5.5]->[4.5,5.5]∩... box1 at origin: [4.5,5.5].
    n_valid = int((out["dists"][0] > 0).sum())
    assert n_valid == 20  # 2.0 total length / 0.1
    t = out["t"][0, :n_valid]
    # First 10 samples in box2's interval, next 10 in box1's.
    assert (out["instance_id"][0, :10] == 1).all()
    assert (out["instance_id"][0, 10:20] == 0).all()
    # Arc-length continuity across the gap: t jumps by ~1.0 + step.
    gap = t[10] - t[9]
    assert abs(gap - (1.0 + 0.1)) < 0.05


def test_oracle_mesh_terminator_and_occlusion():
    scene = Scene(b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5])
    scene.add_instance(np.eye(4, dtype=np.float32))
    # Opaque floor at z = -2 blocks the ray beyond the patch.
    V = np.array([[-5, -5, -2], [5, -5, -2], [5, 5, -2], [-5, 5, -2]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    scene.base_mesh = SceneMesh(V, F)

    rays_o = np.array([[0, 0, 5.0]], np.float32)
    rays_d = np.array([[0, 0, -1.0]], np.float32)
    out = oracle.get_model_input(scene, rays_o, rays_d, np.zeros((1, 0), np.float32), 64, 0.1)
    assert out["hit"][0]
    assert out["alpha_last"][0, 0] == 1.0  # terminator present
    np.testing.assert_allclose(out["color_last"][0, 0], 0.0)  # base mesh = black
    # Samples stop at the patch exit (before the floor).
    n_valid = int((out["dists"][0] > 0).sum())
    assert abs(out["dists"][0][:n_valid].sum() - 1.0) < 1e-4


def test_oracle_mesh_cuts_segment():
    """Floor passes through the patch: segment clipped at the mesh hit."""
    scene = Scene(b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5])
    scene.add_instance(np.eye(4, dtype=np.float32))
    V = np.array([[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    scene.base_mesh = SceneMesh(V, F)

    out = oracle.get_model_input(
        scene,
        np.array([[0, 0, 5.0]], np.float32),
        np.array([[0, 0, -1.0]], np.float32),
        np.zeros((1, 0), np.float32),
        64,
        0.05,
    )
    n_valid = int((out["dists"][0] > 0).sum())
    # Only [4.5, 5.0] before the mesh: 0.5 length.
    assert abs(out["dists"][0][:n_valid].sum() - 0.5) < 1e-4
    assert out["alpha_last"][0, 0] == 1.0


def test_oracle_overlap_weights():
    scene = Scene(
        b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5], instance_sampling_method="random"
    )
    # Two co-located boxes: every sample lies in both.
    scene.add_instance(np.eye(4, dtype=np.float32))
    scene.add_instance(np.eye(4, dtype=np.float32))
    out = oracle.get_model_input(
        scene,
        np.array([[0, 0, 5.0]], np.float32),
        np.array([[0, 0, -1.0]], np.float32),
        np.zeros((1, 0), np.float32),
        32,
        0.1,
    )
    n_valid = int((out["dists"][0] > 0).sum())
    np.testing.assert_allclose(out["alpha_weight"][0, :n_valid], 2.0)
    ids = out["instance_id"][0, :n_valid]
    assert set(np.unique(ids)) <= {0, 1}


def test_oracle_shadowing():
    """A second patch box above the sample point blocks the vertical light."""
    scene = Scene(
        b_0=[-0.5, -0.5, -0.5],
        b_1=[0.5, 0.5, 0.5],
        cast_shadow_rays=True,
        textures=["light"],
    )
    scene.add_instance(np.eye(4, dtype=np.float32))
    blocker = np.eye(4, dtype=np.float32)
    blocker[2, 3] = 3.0
    scene.add_instance(blocker)

    # Horizontal ray through the lower box only.
    rays_o = np.array([[5.0, 0, 0]], np.float32)
    rays_d = np.array([[-1.0, 0, 0]], np.float32)
    params = np.array([[0, 0, 1.0]], np.float32)  # light dir straight up
    out = oracle.get_model_input(scene, rays_o, rays_d, params, 32, 0.1)
    n_valid = int((out["dists"][0] > 0).sum())
    assert n_valid > 0
    # Shadowed -> local light dir = [0,0,-1] (ambient only).
    np.testing.assert_allclose(out["parameters"][0, :n_valid, :3], np.tile([0, 0, -1.0], (n_valid, 1)), atol=1e-5)

    # Without the blocker the local light dir is +z (identity frame).
    scene2 = Scene(
        b_0=[-0.5, -0.5, -0.5], b_1=[0.5, 0.5, 0.5], cast_shadow_rays=True, textures=["light"]
    )
    scene2.add_instance(np.eye(4, dtype=np.float32))
    out2 = oracle.get_model_input(scene2, rays_o, rays_d, params, 32, 0.1)
    n_valid2 = int((out2["dists"][0] > 0).sum())
    np.testing.assert_allclose(out2["parameters"][0, :n_valid2, :3], np.tile([0, 0, 1.0], (n_valid2, 1)), atol=1e-5)
