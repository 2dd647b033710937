"""Synthetic swatch datasets: analytic stand-in for the Blender toolchain.

The reference creates training data by rendering a material swatch in Cycles
(data/create_dataset.py) — those .blend assets aren't available here, so this
generates parameter-conditioned images of an *analytic* volume with the same
TFRecord schema (image/pose/angle/parameters).  The field responds to the
conventional parameter layout [geometry..., appearance..., light dir x3]:
geometry scales the slab height, appearance tints the medium, the light
direction shades it.  Training the ParamNerf on this data must converge —
which makes it the framework's end-to-end integration/benchmark workload.
"""

import os

import numpy as np

from nerftex_tpu.data import tfrecord as tfr
from nerftex_tpu.data.dataset import look_at_np
from nerftex_tpu.data.ray_sampler import rays_from_camera_np
from nerftex_tpu.data.distribution import Hemisphere
from nerftex_tpu.utils.image import encode_png


def field_density(pts, geo, b_0, b_1):
    """Soft slab whose height scales with the first geometry parameter."""
    z0, z1 = b_0[2], b_1[2]
    height = z0 + (0.25 + 0.65 * float(geo[0])) * (z1 - z0)
    in_xy = np.all((pts[..., :2] > b_0[:2]) & (pts[..., :2] < b_1[:2]), -1)
    sigma = 25.0 / (1.0 + np.exp(-12.0 * (height - pts[..., 2])))
    return sigma * in_xy


def field_color(pts, dirs, app, light):
    """Appearance-tinted lambert-ish shading against the light direction."""
    base = np.array([0.9, 0.55, 0.25], np.float32)
    if len(app) >= 1:
        base = base * (0.4 + 0.6 * float(app[0]))
    if len(app) >= 2:
        base = base ** (0.5 + float(app[1]))
    ambient = float(app[2]) if len(app) >= 3 else 0.15
    shade = ambient + 0.85 * max(0.0, -float(light[2]))
    stripes = 0.75 + 0.25 * np.sin(8.0 * pts[..., 0]) * np.sin(8.0 * pts[..., 1])
    return np.clip(base[None, :] * (shade * stripes)[..., None], 0, 1)


def render_swatch(pose, params, n_geo, size, angle, b_0, b_1, n_steps=192):
    """Numerically integrate the analytic field along camera rays -> RGBA."""
    focal = size / np.tan(angle / 2) / 2
    idx = np.arange(size * size)
    loc = np.stack([idx // size, idx % size], -1).astype(np.float32)
    rays_o, rays_d, _ = rays_from_camera_np(loc, size, size, focal, pose)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    from nerftex_tpu.ops.proxy import aabb_intersect_np

    t = aabb_intersect_np(rays_o, rays_d, b_0, b_1)
    hit = np.isfinite(t[:, 0])
    t0 = np.where(hit, t[:, 0], 0)
    t1 = np.where(hit, t[:, 1], 0)

    zs = t0[:, None] + (t1 - t0)[:, None] * np.linspace(0, 1, n_steps)[None]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * zs[..., None]

    geo = params[:n_geo]
    app = params[n_geo:-3] if len(params) >= 3 else params[n_geo:]
    light = params[-3:] if len(params) >= 3 else np.array([0, 0, -1.0])

    sigma = field_density(pts, geo, np.asarray(b_0), np.asarray(b_1))
    color = field_color(pts, rays_d, app, light)

    dists = np.diff(zs, axis=-1)
    dists = np.concatenate([dists, dists[:, -1:]], -1)
    alpha = 1 - np.exp(-sigma * dists)
    trans = np.cumprod(1 - alpha + 1e-10, -1)
    trans = np.concatenate([np.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    w = alpha * trans

    rgb = (w[..., None] * color).sum(1)
    a = w.sum(1)
    rgba = np.concatenate([rgb, a[:, None]], -1).reshape(size, size, 4)
    # np.divide(..., where=...) without out= leaves garbage in masked entries;
    # zero the un-premultiplied color wherever alpha vanishes instead.
    rgba[..., :3] = np.where(
        rgba[..., 3:] > 1e-5, rgba[..., :3] / np.maximum(rgba[..., 3:], 1e-5), 0.0
    )
    return np.clip(rgba, 0, 1)


def make_swatch_renderer_jax(size, angle, b_0, b_1, n_geo, n_steps=192):
    """Jitted device twin of render_swatch: (pose [4,4], params [P]) ->
    uint8 RGBA [size,size,4].  Same analytic field / integrator as the numpy
    path; used to generate full-scale (512^2 x thousands of views) datasets
    where the host integrator would take hours.  Returns uint8 so only 1
    byte/px/channel crosses the device tunnel."""
    import jax
    import jax.numpy as jnp

    b_0 = jnp.asarray(b_0, jnp.float32)
    b_1 = jnp.asarray(b_1, jnp.float32)
    focal = size / np.tan(angle / 2) / 2
    idx = np.arange(size * size)
    loc = np.stack([idx // size, idx % size], -1).astype(np.float32)

    @jax.jit
    def render(pose, params):
        dirs = jnp.stack(
            [
                (loc[:, 1] + 0.5 - 0.5 * size) / focal,
                -(loc[:, 0] + 0.5 - 0.5 * size) / focal,
                -jnp.ones(loc.shape[0], jnp.float32),
            ],
            -1,
        )
        rays_d = jnp.sum(dirs[:, None, :] * pose[:3, :3], -1)
        rays_o = jnp.broadcast_to(pose[:3, -1], rays_d.shape)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        inv_d = 1.0 / rays_d
        t_a = (b_0 - rays_o) * inv_d
        t_b = (b_1 - rays_o) * inv_d
        t0r = jnp.minimum(t_a, t_b).max(-1)
        t1r = jnp.maximum(t_a, t_b).min(-1)
        hit = t0r < t1r
        t0 = jnp.where(hit, t0r, 0.0)
        t1 = jnp.where(hit, t1r, 0.0)

        zs = t0[:, None] + (t1 - t0)[:, None] * jnp.linspace(0, 1, n_steps)[None]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * zs[..., None]

        geo = params[:n_geo]
        app = params[n_geo:-3]
        light = params[-3:]

        # field_density
        height = b_0[2] + (0.25 + 0.65 * geo[0]) * (b_1[2] - b_0[2])
        in_xy = jnp.all((pts[..., :2] > b_0[:2]) & (pts[..., :2] < b_1[:2]), -1)
        sigma = 25.0 / (1.0 + jnp.exp(-12.0 * (height - pts[..., 2]))) * in_xy

        # field_color (app layout of the numpy twin, n_app >= 3 case)
        base = jnp.asarray([0.9, 0.55, 0.25], jnp.float32)
        base = base * (0.4 + 0.6 * app[0]) if app.shape[0] >= 1 else base
        base = base ** (0.5 + app[1]) if app.shape[0] >= 2 else base
        ambient = app[2] if app.shape[0] >= 3 else 0.15
        shade = ambient + 0.85 * jnp.maximum(0.0, -light[2])
        stripes = 0.75 + 0.25 * jnp.sin(8.0 * pts[..., 0]) * jnp.sin(8.0 * pts[..., 1])
        color = jnp.clip(base[None, None, :] * (shade * stripes)[..., None], 0, 1)

        dists = jnp.diff(zs, axis=-1)
        dists = jnp.concatenate([dists, dists[:, -1:]], -1)
        alpha = 1 - jnp.exp(-sigma * dists)
        trans = jnp.cumprod(1 - alpha + 1e-10, -1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
        w = alpha * trans

        rgb = (w[..., None] * color).sum(1)
        a = w.sum(1)
        rgba = jnp.concatenate([rgb, a[:, None]], -1).reshape(size, size, 4)
        rgba = rgba.at[..., :3].set(
            jnp.where(
                rgba[..., 3:] > 1e-5, rgba[..., :3] / jnp.maximum(rgba[..., 3:], 1e-5), 0.0
            )
        )
        rgba = jnp.clip(rgba, 0, 1)
        return (rgba * 255.0 + 0.5).astype(jnp.uint8)

    return render


def make_synthetic_tfrecord(
    path,
    n_images: int = 32,
    size: int = 32,
    angle: float = 0.63,
    b_0=(-1.5, -1.3, -0.2),
    b_1=(1.3, 1.3, 1.9),
    n_parameters=(1, 6),
    radius: float = 5.0,
    seed: int = 0,
    backend: str = "numpy",
    imgs_per_shard: int = 0,
    progress_every: int = 0,
):
    """Write a reference-schema TFRecord of analytic swatch renders.

    backend='jax' integrates the field on the default JAX device (TPU when
    available) — required for full-scale datasets (512^2 x 5000 views).
    imgs_per_shard > 0 shards the output like nerf2tfr --imgs_per_shard."""
    rs = np.random.RandomState(seed)
    np_state = np.random.get_state()
    np.random.seed(seed)
    render_jax = None
    if backend == "jax":
        render_jax = make_swatch_renderer_jax(
            size, angle, np.asarray(b_0), np.asarray(b_1), n_parameters[0]
        )
    try:
        hemi = Hemisphere()
        n_geo, n_app = n_parameters
        payloads = []
        for i in range(n_images):
            pos = hemi() * radius
            pose = look_at_np(pos)
            params = rs.rand(n_geo + n_app).astype(np.float32)
            if n_app >= 3:
                light = hemi()
                params[-3:] = -light  # light direction points downward
            if render_jax is not None:
                rgba_u8 = np.asarray(render_jax(pose.astype(np.float32), params))
                png = _encode_png_u8(rgba_u8)
            else:
                rgba = render_swatch(
                    pose, params, n_geo, size, angle, np.asarray(b_0), np.asarray(b_1)
                )
                png = encode_png(rgba)
            payloads.append(
                tfr.build_example(
                    {
                        "image": png,
                        "pose": tfr.serialize_tensor(pose.astype(np.float32)),
                        "angle": float(angle),
                        "parameters": tfr.serialize_tensor(params),
                    }
                )
            )
            if progress_every and (i + 1) % progress_every == 0:
                print(f"  synth {i + 1}/{n_images}", flush=True)
    finally:
        np.random.set_state(np_state)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if imgs_per_shard and imgs_per_shard > 0:
        base, ext = os.path.splitext(path)
        n_shards = -(-len(payloads) // imgs_per_shard)
        for s in range(n_shards):
            shard = f"{base}-{s:05d}-of-{n_shards:05d}{ext}"
            tfr.write_records(shard, payloads[s * imgs_per_shard : (s + 1) * imgs_per_shard])
    else:
        tfr.write_records(path, payloads)
    return path


def _encode_png_u8(arr: np.ndarray) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, format="PNG")
    return buf.getvalue()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Generate a synthetic swatch TFRecord.")
    ap.add_argument("out", help="output .tfr path")
    ap.add_argument("--n-images", type=int, default=128)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    make_synthetic_tfrecord(args.out, n_images=args.n_images, size=args.size, seed=args.seed)
    print(args.out)
