"""Ray-march proxies: batched slab-test AABB intersection.

Parity target: reference network/proxy.py:13-35.  Misses produce
t = [inf, inf]; the renderer masks those rays out.
"""

import jax.numpy as jnp


class AABB:
    """Axis-aligned box [b_0, b_1]; callable on ray batches.

    Assumes ray origins outside the box (proxy.py:15); an origin inside
    yields a negative near-t, which downstream code treats like a hit
    starting behind the camera (same as the reference).
    """

    def __init__(self, b_0: list, b_1: list):
        import numpy as np

        self.b_0_np = np.asarray(b_0, np.float32)
        self.b_1_np = np.asarray(b_1, np.float32)
        self.b_0 = jnp.asarray(b_0, jnp.float32)
        self.b_1 = jnp.asarray(b_1, jnp.float32)

    def __call__(self, rays_o, rays_d):
        return aabb_intersect(rays_o, rays_d, self.b_0, self.b_1)

    def intersect_np(self, rays_o, rays_d):
        """Numpy fast path for the host data pipeline (no device dispatch)."""
        return aabb_intersect_np(rays_o, rays_d, self.b_0_np, self.b_1_np)


def aabb_intersect(rays_o, rays_d, b_0, b_1):
    """Slab test. rays_o/rays_d [N,3] -> t [N,2] with inf on miss."""
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)

    inv_d = 1.0 / rays_d
    t_a = (b_0 - rays_o) * inv_d
    t_b = (b_1 - rays_o) * inv_d

    t_near = jnp.minimum(t_a, t_b)
    t_far = jnp.maximum(t_a, t_b)

    t_0 = jnp.max(t_near, axis=-1)
    t_1 = jnp.min(t_far, axis=-1)

    hit = t_0 < t_1
    inf = jnp.float32(jnp.inf)
    t_0 = jnp.where(hit, t_0, inf)
    t_1 = jnp.where(hit, t_1, inf)

    return jnp.stack([t_0, t_1], -1)


def aabb_intersect_np(rays_o, rays_d, b_0, b_1):
    """Numpy twin of aabb_intersect for host-side pipelines."""
    import numpy as np

    rays_o = np.asarray(rays_o, np.float32)
    rays_d = np.asarray(rays_d, np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_d = 1.0 / rays_d
        t_a = (b_0 - rays_o) * inv_d
        t_b = (b_1 - rays_o) * inv_d
    t_0 = np.minimum(t_a, t_b).max(-1)
    t_1 = np.maximum(t_a, t_b).min(-1)
    hit = t_0 < t_1
    t_0 = np.where(hit, t_0, np.inf)
    t_1 = np.where(hit, t_1, np.inf)
    return np.stack([t_0, t_1], -1)
