"""Device-resident training data: the whole decoded dataset lives in HBM and
every per-step sampling op runs inside the training jit.

Motivation (measured, BASELINE.md round 3): the full-scale carpet run
(5,000 x 512^2 views) trained at ~35 steps/s wall against a 66.5 steps/s
pure-device step — the gap is the host: one CPU core decoding/sampling rays
(`data.dataset.RayDataset`) plus the per-step host->device batch transfer
over the device tunnel.  This module removes the host from the steady-state
loop entirely:

  * images are uploaded ONCE as uint8 [N,H,W,4] (the PNG datasets' native
    precision — 512^2 x 5000 views = 5.2 GB, well inside a v5e's HBM), with
    the `u8/255 -> premultiply` decode math of
    `dataset.LazyTFRecordSource.__getitem__` (dataset.py:66-77) replayed
    per-sample on device, bit-identically;
  * poses/parameters ride along as tiny f32 tables;
  * the Proxy pixel sampler's hit test (reference network/pixel_sampler.py:
    31-66) is precomputed per pose into a padded hit-CELL table at the
    downsampled grid.  Because the host sampler upsamples the hit mask by
    block-repeat, "uniform over hit pixels" factorizes EXACTLY into "uniform
    over hit cells x uniform within the d x d cell" — so the device needs
    only [N, Hd*Wd] int32 of state, not per-pixel index lists;
  * ray generation + AABB near/far (reference network/ray_sampler.py:23-37)
    run in-jit via the same broadcast-mul-sum expressions as
    `ops.rays.rays_from_camera` (kept in that op's exact arithmetic order so
    results match the host pipeline to float32 rounding).

Deliberate deviations from the host pipeline (PARITY.md §additions):
  * image choice is iid uniform per step instead of shuffle-buffer-over-
    epochs (the reference's shuffle(100) over a 5,000-view repeat stream is
    itself only a local shuffle; iid mixes strictly better);
  * pixel choice within one draw is iid (with replacement) instead of a
    permutation prefix — indistinguishable for n_samples << hit count.

Opt in from the reference-schema config with `device_resident: true` on the
train `Dataset` (a framework extension; the host pipeline remains the
default and the two paths share every constant).
"""

from typing import Any

import numpy as np

from nerftex_tpu.data import pixel_sampler as px_mod
from nerftex_tpu.data import ray_sampler as ray_mod
from nerftex_tpu.data.dataset import LazyTFRecordSource
from nerftex_tpu.data.ray_sampler import rays_from_camera_np


class DeviceResidentSampler:
    """Builds device tables from a record source and serves training batches
    as a pure jittable function of a PRNG key."""

    def __init__(
        self,
        source: Any,
        pixel_sampler: Any,
        ray_sampler: Any,
        batchsize: int,
        height: int,
        width: int,
        focal: float,
        composite_bkgd: bool,
        bkgd_color,
        max_bytes: int = 12 << 30,
    ):
        if isinstance(pixel_sampler, px_mod.Proxy):
            d = int(pixel_sampler.downsample_factor)
            if height % d or width % d:
                raise ValueError(
                    "device_resident Proxy sampling needs height/width divisible "
                    f"by downsample_factor (got {height}x{width}, factor {d}); "
                    "partial boundary cells would break cell-uniform sampling"
                )
        elif isinstance(pixel_sampler, px_mod.Independent):
            d = 1
        else:
            raise ValueError(
                f"device_resident supports Proxy/Independent pixel samplers, "
                f"got {type(pixel_sampler).__name__}"
            )
        if not isinstance(ray_sampler, (ray_mod.Proxy, ray_mod.Frustum)):
            raise ValueError(
                f"device_resident supports Proxy/Frustum ray samplers, "
                f"got {type(ray_sampler).__name__}"
            )

        self.batchsize = int(batchsize)
        self.n_samples = int(pixel_sampler.n_samples)
        self.height = int(height)
        self.width = int(width)
        self.focal = float(focal)
        self.composite_bkgd = bool(composite_bkgd)
        self.bkgd_color = np.asarray(bkgd_color, np.float32)
        self.downsample = d
        self._pixel_mode = "proxy" if isinstance(pixel_sampler, px_mod.Proxy) else "independent"
        self._ray_mode = "proxy" if isinstance(ray_sampler, ray_mod.Proxy) else "frustum"
        if self._ray_mode == "frustum":
            self._near = float(ray_sampler.near)
            self._far = float(ray_sampler.far)
            self._proxy = None
        else:
            self._proxy = ray_sampler.proxy

        n = len(source)
        images, store = self._decode_all(source, n, max_bytes)
        poses = np.stack(
            [np.asarray(self._pose_of(source, i), np.float32) for i in range(n)]
        )
        params = np.stack(
            [np.asarray(source[i]["parameters"], np.float32).reshape(-1) for i in range(n)]
        )

        if self._pixel_mode == "proxy":
            cells, counts = self._hit_cell_tables(pixel_sampler, poses)
        else:
            cells = np.zeros((n, 1), np.int32)
            counts = np.zeros((n,), np.int32)  # count==0 -> uniform fallback

        import jax

        self._store = store
        # device_put (not closure capture): the tables are passed to the
        # jitted step as ARGUMENTS via `self.tables` — capturing a multi-GB
        # image table as a lowering constant would serialize it into the HLO
        # program itself (slow compile, double HBM, cache bloat).
        self.images = jax.device_put(images)
        self.poses = jax.device_put(poses)
        self.parameters = jax.device_put(params)
        self.cells = jax.device_put(cells)
        self.counts = jax.device_put(counts)
        self.n_images = n
        self.n_parameters = params.shape[-1]

    @property
    def tables(self) -> dict:
        """The device state, to be threaded through jit as an argument."""
        return {
            "images": self.images,
            "poses": self.poses,
            "parameters": self.parameters,
            "cells": self.cells,
            "counts": self.counts,
        }

    # -- setup ----------------------------------------------------------

    @staticmethod
    def _pose_of(source, i):
        if isinstance(source, LazyTFRecordSource):
            from nerftex_tpu.data import tfrecord as tfr

            # Raw parse: poses without triggering an image decode.
            return tfr.parse_tensor(source.examples[i]["pose"]).astype(np.float32).reshape(4, 4)
        return source[i]["pose"]

    def _decode_all(self, source, n, max_bytes):
        """[N,H,W,4] image table: uint8 straight-alpha for PNG sources (the
        decode math replays on device), float32 premultiplied for the rest."""
        if isinstance(source, LazyTFRecordSource) and not source.read_exr:
            from nerftex_tpu.utils.image import decode_png_u8

            need = n * self.height * self.width * 4
            if need > max_bytes:
                raise ValueError(f"dataset needs {need >> 20} MiB u8, over the {max_bytes >> 20} MiB cap")
            images = np.empty((n, self.height, self.width, 4), np.uint8)
            for i in range(n):
                images[i] = decode_png_u8(source.examples[i]["image"])
            return images, "u8"

        need = n * self.height * self.width * 4 * 4
        if need > max_bytes:
            raise ValueError(
                f"float dataset needs {need >> 20} MiB on device, over the "
                f"{max_bytes >> 20} MiB cap — use the host pipeline"
            )
        images = np.empty((n, self.height, self.width, 4), np.float32)
        for i in range(n):
            rec = source[i]
            images[i, ..., :3] = rec["image"]
            images[i, ..., 3] = rec["alpha"]
        return images, "f32"

    def _hit_cell_tables(self, sampler, poses):
        """Per-pose flat indices of downsampled grid cells whose center ray
        hits the proxy — the exact mask `pixel_sampler.Proxy._hit_pixels`
        computes before upsampling (pixel_sampler.py:66-86)."""
        hd, wd, fd = sampler.height_down, sampler.width_down, sampler.focal
        idx = np.arange(hd * wd)
        loc = np.stack([idx // wd, idx % wd], -1)
        n = poses.shape[0]
        hits = np.zeros((n, hd * wd), bool)
        for i in range(n):
            rays_o, rays_d, _ = rays_from_camera_np(loc, hd, wd, fd, poses[i])
            proxy = sampler.proxy
            if hasattr(proxy, "intersect_np"):
                t = proxy.intersect_np(rays_o, rays_d)
            else:
                t = np.asarray(proxy(rays_o, rays_d))
            hits[i] = np.isfinite(t[:, 0])

        counts = hits.sum(-1).astype(np.int32)
        c_max = max(1, int(counts.max()))
        cells = np.zeros((n, c_max), np.int32)
        for i in range(n):
            where = np.flatnonzero(hits[i])
            cells[i, : where.size] = where
        return cells, counts

    # -- the per-step sampling function (pure, jittable) ----------------

    def sample(self, key, with_aux: bool = False):
        """Convenience wrapper over sample_from with this sampler's tables.
        Inside a jit, prefer `sample_from(tables, key)` with the tables
        passed as jit arguments (see `tables`)."""
        return self.sample_from(self.tables, key, with_aux)

    def sample_from(self, tables: dict, key, with_aux: bool = False):
        """(tables, key) -> training batch dict with the host pipeline's
        shapes: rays_o/rays_d [B,n,3], t [B,n,2], cone_scale [B,n,1],
        color [B,n,3], alpha [B,n], parameters [B,P].  with_aux=True
        additionally returns {img_idx [B], loc [B,n,2]} for tests."""
        import jax
        import jax.numpy as jnp

        b, n = self.batchsize, self.n_samples
        h, w, d = self.height, self.width, self.downsample
        hd, wd = h // d, w // d

        k_img, k_cell, k_sub = jax.random.split(key, 3)

        img_idx = jax.random.randint(k_img, (b,), 0, self.n_images)

        counts = tables["counts"][img_idx]  # [B]
        u = jax.random.uniform(k_cell, (b, n))
        # Uniform over that image's hit cells; a zero count (degenerate pose,
        # or the Independent sampler) falls back to uniform over ALL cells —
        # the host fallback at pixel_sampler.py:91-95.
        pick = jnp.minimum((u * counts[:, None]).astype(jnp.int32), counts[:, None] - 1)
        cell_hit = jnp.take_along_axis(tables["cells"][img_idx], jnp.maximum(pick, 0), axis=1)
        cell_all = jnp.minimum((u * (hd * wd)).astype(jnp.int32), hd * wd - 1)
        cell = jnp.where(counts[:, None] > 0, cell_hit, cell_all)

        sub = jax.random.randint(k_sub, (b, n, 2), 0, d) if d > 1 else 0
        ci, cj = cell // wd, cell % wd
        if d > 1:
            i = ci * d + sub[..., 0]
            j = cj * d + sub[..., 1]
        else:
            i, j = ci, cj

        # Rays: ops.rays.rays_from_camera's arithmetic, batched over poses
        # (broadcast-mul-sum kept so values match the host pipeline).
        c2w = tables["poses"][img_idx]  # [B,4,4]
        loc = jnp.stack([i, j], -1).astype(jnp.float32)
        dirs = jnp.stack(
            [
                (loc[..., 1] + 0.5 - 0.5 * w) / self.focal,
                -(loc[..., 0] + 0.5 - 0.5 * h) / self.focal,
                -jnp.ones((b, n), jnp.float32),
            ],
            -1,
        )  # [B,n,3]
        rays_d = jnp.sum(dirs[:, :, None, :] * c2w[:, None, :3, :3], -1)
        rays_o = jnp.broadcast_to(c2w[:, None, :3, -1], rays_d.shape)
        r_xy = jnp.linalg.norm(dirs[..., :2], axis=-1)
        cone_scale = (jnp.cos(jnp.arctan(r_xy)) / jnp.linalg.norm(dirs, axis=-1) / self.focal)[
            ..., None
        ]

        if self._ray_mode == "proxy":
            rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            t = self._proxy(rays_o, rays_d)
        else:
            t = jnp.stack(
                [jnp.full((b, n), self._near, jnp.float32), jnp.full((b, n), self._far, jnp.float32)],
                -1,
            )

        # Pixel gather + the LazyTFRecordSource decode math (dataset.py:66-77).
        px = tables["images"][img_idx[:, None], i, j]  # [B,n,4]
        if self._store == "u8":
            img_f = px.astype(jnp.float32) / 255.0
            rgb, a = img_f[..., :3], img_f[..., 3:]
            if self.composite_bkgd:
                color = rgb * a + (1 - a) * jnp.asarray(self.bkgd_color)
            else:
                color = rgb * a
            alpha = img_f[..., 3]
        else:
            color = px[..., :3]
            alpha = px[..., 3]

        batch = {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "t": t,
            "cone_scale": cone_scale,
            "color": color,
            "alpha": alpha,
            "parameters": tables["parameters"][img_idx],
        }
        if with_aux:
            return batch, {"img_idx": img_idx, "loc": jnp.stack([i, j], -1)}
        return batch
