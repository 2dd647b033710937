import numpy as np
import pytest

from nerftex_tpu.instancing import native
from nerftex_tpu.instancing.scene import SceneMesh, closest_point_on_mesh
from nerftex_tpu.instancing.oracle import mesh_first_hit


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library not buildable here")
    return lib


def _random_mesh(n_tris=60, seed=0):
    rs = np.random.RandomState(seed)
    V = rs.randn(n_tris * 3, 3).astype(np.float32)
    F = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return SceneMesh(V, F)


def test_native_closest_points_match_numpy(lib):
    mesh = _random_mesh()
    rs = np.random.RandomState(1)
    queries = rs.randn(40, 3).astype(np.float32)
    a = mesh.V[mesh.F[:, 0]]
    b = mesh.V[mesh.F[:, 1]]
    c = mesh.V[mesh.F[:, 2]]

    tri_n, bary_n, dist_n = native.closest_points(queries, a, b, c)
    for i, q in enumerate(queries):
        tri_p, bary_p, dist_p = closest_point_on_mesh(q, mesh)
        # Distances must agree exactly-ish; triangle ids may differ on ties.
        assert abs(dist_n[i] - dist_p) < 1e-4, (i, dist_n[i], dist_p)
        np.testing.assert_allclose(bary_n[i].sum(), 1.0, atol=1e-5)
        if tri_n[i] == tri_p:
            np.testing.assert_allclose(bary_n[i], bary_p, atol=1e-4)


def test_native_ray_casts_match_numpy(lib):
    mesh = _random_mesh(n_tris=40, seed=3)
    rs = np.random.RandomState(2)
    n = 30
    rays_o = rs.randn(n, 3).astype(np.float32) * 3
    rays_d = rs.randn(n, 3).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    v0 = mesh.V[mesh.F[:, 0]]
    e1 = mesh.V[mesh.F[:, 1]] - v0
    e2 = mesh.V[mesh.F[:, 2]] - v0
    t_n, tri_n, u_n, v_n = native.ray_mesh_first_hit(rays_o, rays_d, v0, e1, e2)

    for i in range(n):
        hit = mesh_first_hit(mesh, rays_o[i], rays_d[i])
        if hit is None:
            assert np.isinf(t_n[i])
        else:
            assert abs(t_n[i] - hit[0]) < 1e-4
            assert tri_n[i] == hit[1]


def test_scene_build_uses_native_consistently(tmp_path):
    """Scene built with native closest-point gives the same placement as the
    numpy fallback."""
    from nerftex_tpu.tools import gen_assets
    from nerftex_tpu.instancing.scene import Scene

    out = str(tmp_path / "meshes")
    gen_assets.generate(out, seed=0)

    def build():
        s = Scene(b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8], seed=0)
        s.distribute_instances_on_mesh(
            f"{out}/cloth_mesh.ply", 0.09, f"{out}/cloth_anchor_points.ply"
        )
        return s

    s_native = build()

    # Force the numpy path by hiding the library.
    orig = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        s_numpy = build()
    finally:
        native._LIB, native._TRIED = orig

    np.testing.assert_allclose(
        np.asarray(s_native.forward), np.asarray(s_numpy.forward), atol=1e-4
    )
    np.testing.assert_allclose(s_native.anchor_uv, s_numpy.anchor_uv, atol=1e-4)
    np.testing.assert_allclose(s_native.uv_jacobian, s_numpy.uv_jacobian, atol=1e-3)
