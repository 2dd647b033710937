"""Shim: reference path `network.ray_sampler` -> nerftex_tpu.data.ray_sampler."""
from nerftex_tpu.data.ray_sampler import Frustum, Proxy, rays_from_camera, rays_from_camera_np
