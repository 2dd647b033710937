"""Camera/ray math (pinhole model, cone footprints, look-at transforms).

Parity targets: reference network/ray_sampler.py:39-48 (rays_from_camera +
cone_scale formula) and network/dataset.py:231-238 (look_at).  All functions
are pure jnp and shape-polymorphic over a leading batch dimension, so they can
run inside jit on device or eagerly on host.
"""

import jax.numpy as jnp


def rays_from_camera(image_plane_loc, height, width, focal, c2w):
    """Pixel coords [N,2] (row, col) -> world rays + per-ray cone scale.

    OpenGL-style pinhole: camera looks down -z, +x right, +y up
    (ray_sampler.py:39-48).  Returns (rays_o [N,3], rays_d [N,3],
    cone_scale [N,1]).  rays_d is NOT normalized (matches reference).
    """
    image_plane_loc = jnp.asarray(image_plane_loc, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)

    dirs = jnp.stack(
        [
            (image_plane_loc[:, 1] + 0.5 - 0.5 * width) / focal,
            -(image_plane_loc[:, 0] + 0.5 - 0.5 * height) / focal,
            -jnp.ones(image_plane_loc.shape[0], jnp.float32),
        ],
        -1,
    )
    rays_d = jnp.sum(dirs[:, None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)

    # Un-projected radius of a pixel cone: cos(atan(r_xy)) / ||dirs|| / focal
    # (ray_sampler.py:46).
    r_xy = jnp.linalg.norm(dirs[:, :2], axis=-1)
    cone_scale = jnp.cos(jnp.arctan(r_xy)) / jnp.linalg.norm(dirs, axis=-1) / focal

    return rays_o, rays_d, cone_scale[:, None]


def look_at(pos, to=(0.0, 0.0, 0.0), offset=(0.0, 0.0, 0.0), eps=1e-6):
    """Camera-to-world 4x4 from an eye position looking at `to`, z-up
    (dataset.py:231-238; note the reference adds eps *inside* normalize)."""
    pos = jnp.asarray(pos, jnp.float32)
    to = jnp.asarray(to, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    up = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    def _norm(v):
        return v / jnp.linalg.norm(v)

    v_forward = _norm(pos - to + eps)
    v_right = _norm(jnp.cross(up, v_forward) + eps)
    v_up = _norm(jnp.cross(v_forward, v_right) + eps)

    top = jnp.stack([v_right, v_up, v_forward, pos + offset], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)
