"""ctypes bridge to the native scene-compiler kernels (native/scene_compiler.cpp).

Auto-builds the shared library on first use when a compiler is available;
callers fall back to the numpy implementations when it isn't.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnerftex_native.so")


def get_lib():
    """The loaded library or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True

    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.nt_closest_points.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, f32p, ctypes.c_int64, i32p, f32p, f32p,
    ]
    lib.nt_closest_points.restype = None
    lib.nt_ray_mesh_first_hit.argtypes = [
        f32p, f32p, ctypes.c_int64, f32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, f32p, i32p, f32p, f32p,
    ]
    lib.nt_ray_mesh_first_hit.restype = None

    _LIB = lib
    return _LIB


def closest_points(queries, tri_a, tri_b, tri_c):
    """Batched exact closest-point queries.  queries [N,3], tri_* [T,3] ->
    (tri_idx [N], bary [N,3], dist [N]).  Returns None if the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    queries = np.ascontiguousarray(queries, np.float32)
    tri_a = np.ascontiguousarray(tri_a, np.float32)
    tri_b = np.ascontiguousarray(tri_b, np.float32)
    tri_c = np.ascontiguousarray(tri_c, np.float32)
    n, t = len(queries), len(tri_a)
    out_tri = np.empty(n, np.int32)
    out_bary = np.empty((n, 3), np.float32)
    out_dist = np.empty(n, np.float32)
    lib.nt_closest_points(queries, n, tri_a, tri_b, tri_c, t, out_tri, out_bary, out_dist)
    return out_tri, out_bary, out_dist


def ray_mesh_first_hit(rays_o, rays_d, v0, e1, e2, t_max=100.0):
    """Batched first-hit casts -> (t [N] (inf=miss), tri [N], u [N], v [N]);
    None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rays_o = np.ascontiguousarray(rays_o, np.float32)
    rays_d = np.ascontiguousarray(rays_d, np.float32)
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n, t = len(rays_o), len(v0)
    out_t = np.empty(n, np.float32)
    out_tri = np.empty(n, np.int32)
    out_u = np.empty(n, np.float32)
    out_v = np.empty(n, np.float32)
    lib.nt_ray_mesh_first_hit(rays_o, rays_d, n, v0, e1, e2, t, t_max, out_t, out_tri, out_u, out_v)
    return out_t, out_tri, out_u, out_v
