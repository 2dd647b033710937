import numpy as np

from nerftex_tpu.ops.rays import rays_from_camera, look_at
from nerftex_tpu.ops.proxy import AABB
from nerftex_tpu.ops.interpolate import (
    interpolate_img,
    interpolate_nd,
    gaussian_kernel,
    filtered_downsample,
)


def test_center_pixel_ray_points_forward():
    h = w = 8
    focal = 10.0
    c2w = np.eye(4, dtype=np.float32)
    # 8x8 image has no exact center pixel; probe with a fractional loc.
    loc = np.array([[h / 2 - 0.5, w / 2 - 0.5]], np.float32)
    rays_o, rays_d, cone = rays_from_camera(loc, h, w, focal, c2w)
    np.testing.assert_allclose(np.asarray(rays_o), [[0, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_d), [[0, 0, -1]], atol=1e-6)
    # On-axis pixel cone: cos(atan(0)) / 1 / focal = 1/focal.
    np.testing.assert_allclose(np.asarray(cone), [[1 / focal]], atol=1e-6)


def test_rays_respect_camera_rotation():
    h = w = 4
    focal = 5.0
    pos = np.array([2.0, -3.0, 1.5])
    c2w = np.asarray(look_at(pos))
    loc = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1).reshape(-1, 2)
    rays_o, rays_d, _ = rays_from_camera(loc.astype(np.float32), h, w, focal, c2w)
    np.testing.assert_allclose(np.asarray(rays_o), np.tile(pos, (h * w, 1)), atol=1e-5)
    # All rays roughly point from pos toward the origin.
    mean_dir = np.asarray(rays_d).mean(0)
    mean_dir /= np.linalg.norm(mean_dir)
    np.testing.assert_allclose(mean_dir, -pos / np.linalg.norm(pos), atol=0.1)


def test_look_at_is_orthonormal():
    m = np.asarray(look_at(np.array([1.0, 2.0, 3.0])))
    rot = m[:3, :3]
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-5)
    assert m[3].tolist() == [0, 0, 0, 1]


def test_aabb_intersection_against_bruteforce():
    rng = np.random.RandomState(0)
    box = AABB([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0])
    n = 256
    rays_o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    rays_o += np.sign(rays_o) * 1.5  # push origins outside the box
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    t = np.asarray(box(rays_o, rays_d))

    # Brute force: march finely (both directions — the slab test reports
    # boxes behind the origin with negative t, like the reference) and
    # compare inside-interval endpoints.
    ts = np.linspace(-20, 20, 16001)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * ts[None, :, None]
    inside = np.all((pts >= -1) & (pts <= 1), axis=-1)
    for i in range(n):
        idx = np.where(inside[i])[0]
        if len(idx) == 0:
            # Allow borderline grazing rays to disagree with the dense march.
            if np.isfinite(t[i, 0]):
                assert t[i, 1] - t[i, 0] < 0.02
        else:
            assert np.isfinite(t[i, 0])
            assert abs(ts[idx[0]] - t[i, 0]) < 0.01
            assert abs(ts[idx[-1]] - t[i, 1]) < 0.01


def test_aabb_miss_gives_inf():
    box = AABB([0, 0, 0], [1, 1, 1])
    t = np.asarray(box(np.array([[5.0, 5, 5]]), np.array([[1.0, 0, 0]])))
    assert np.isinf(t).all()


def test_interpolate_img_matches_manual_bilinear():
    img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    x = np.array([[0.5, 0.5], [1.0, 2.0], [0.25, 3.0]], np.float32)
    out = np.asarray(interpolate_img(x, img))
    def manual(r, c):
        r0, c0 = int(np.floor(r)), int(np.floor(c))
        fr, fc = r - r0, c - c0
        def px(i, j):
            return img[min(i, 2), min(j, 3), 0]
        return (px(r0, c0) * (1 - fr) * (1 - fc) + px(r0 + 1, c0) * fr * (1 - fc)
                + px(r0, c0 + 1) * (1 - fr) * fc + px(r0 + 1, c0 + 1) * fr * fc)
    expected = np.array([[manual(*p)] for p in x])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_interpolate_nd_linear_function_is_exact():
    # f(x,y) = 2x + 3y sampled on a grid; multilinear interp must be exact.
    gx, gy = np.meshgrid(np.linspace(0, 1, 5), np.linspace(0, 1, 7), indexing="ij")
    grid = (2 * gx + 3 * gy)[..., None].astype(np.float32)
    q = np.array([[0.33, 0.77], [0.5, 0.5], [0.9, 0.1]], np.float32)
    out = np.asarray(interpolate_nd(q, grid))
    expected = (2 * q[:, 0] + 3 * q[:, 1])[:, None]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel(5, 1.0, channels=3))
    assert k.shape == (5, 5, 3, 1)
    np.testing.assert_allclose(k[:, :, 0, 0].sum(), 1.0, atol=1e-6)


def test_filtered_downsample_constant_image():
    img = np.full((16, 16, 3), 0.7, np.float32)
    out = np.asarray(filtered_downsample(img, 2))
    assert out.shape == (8, 8, 3)
    # SAME zero-padding dims the borders (exactly like tf.nn.depthwise_conv2d
    # in the reference, util/interpolate.py:82); the interior is exact.
    np.testing.assert_allclose(out[2:-2, 2:-2], 0.7, atol=1e-4)
    assert np.all(out <= 0.7 + 1e-4)
