"""Ray samplers: pixel coords -> world rays + near/far t + cone footprint.

Host-side numpy mirror of reference network/ray_sampler.py:6-48 (the
reference ran these inside the tf.data map; here they run in the host
prefetch pipeline, so they must not dispatch to the device).
"""

from typing import Any

import numpy as np


def rays_from_camera_np(image_plane_loc, height, width, focal, c2w):
    """Numpy twin of nerftex_tpu.ops.rays.rays_from_camera
    (ray_sampler.py:39-48)."""
    image_plane_loc = np.asarray(image_plane_loc, np.float32)
    c2w = np.asarray(c2w, np.float32)

    dirs = np.stack(
        [
            (image_plane_loc[:, 1] + 0.5 - 0.5 * width) / focal,
            -(image_plane_loc[:, 0] + 0.5 - 0.5 * height) / focal,
            -np.ones(image_plane_loc.shape[0], np.float32),
        ],
        -1,
    )
    rays_d = np.sum(dirs[:, None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)

    r_xy = np.linalg.norm(dirs[:, :2], axis=-1)
    cone_scale = np.cos(np.arctan(r_xy)) / np.linalg.norm(dirs, axis=-1) / focal

    return rays_o.astype(np.float32), rays_d.astype(np.float32), cone_scale[:, None].astype(np.float32)


class Frustum:
    """Fixed near/far for every ray (ray_sampler.py:6-21)."""

    def __init__(self, height: int, width: int, focal: float, near: float, far: float, **kwargs) -> None:
        self.height = height
        self.width = width
        self.focal = focal
        self.near = near
        self.far = far

    def __call__(self, image_plane_loc, c2w):
        n = image_plane_loc.shape[0]
        rays_o, rays_d, cone_scale = rays_from_camera_np(
            image_plane_loc, self.height, self.width, self.focal, c2w
        )
        t = np.stack(
            [np.full(n, self.near, np.float32), np.full(n, self.far, np.float32)], -1
        )
        return rays_o, rays_d, t, cone_scale


class Proxy:
    """Near/far from proxy intersection; normalizes directions
    (ray_sampler.py:23-37)."""

    def __init__(self, height: int, width: int, focal: float, proxy: Any, **kwargs) -> None:
        self.height = height
        self.width = width
        self.focal = focal
        self.proxy = proxy

    def __call__(self, image_plane_loc, c2w):
        rays_o, rays_d, cone_scale = rays_from_camera_np(
            image_plane_loc, self.height, self.width, self.focal, c2w
        )
        rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        if hasattr(self.proxy, "intersect_np"):
            t = self.proxy.intersect_np(rays_o, rays_d)
        else:
            t = np.asarray(self.proxy(rays_o, rays_d))
        return rays_o, rays_d.astype(np.float32), t.astype(np.float32), cone_scale


# Device-side alias kept for renderers/tests that want the jnp version.
from nerftex_tpu.ops.rays import rays_from_camera  # noqa: E402,F401
