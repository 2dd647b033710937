"""Bisect which stage of the device-instancer graph compiles slowly on TPU."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from nerftex_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

Rb, S, N, K, T = 256, 1024, 900, 64, 4418
rs = np.random.RandomState(0)

inv_rot = jnp.asarray(rs.randn(N, 3, 3).astype(np.float32))
inv_trans = jnp.asarray(rs.randn(N, 3).astype(np.float32))
origins = jnp.asarray(rs.randn(N, 3).astype(np.float32))
tri_v0 = jnp.asarray(rs.randn(T, 3).astype(np.float32))
tri_e1 = jnp.asarray(rs.randn(T, 3).astype(np.float32) * 0.1)
tri_e2 = jnp.asarray(rs.randn(T, 3).astype(np.float32) * 0.1)
b_0 = jnp.asarray([-1.4, -1.2, -0.1], jnp.float32)
b_1 = jnp.asarray([1.2, 1.2, 1.8], jnp.float32)

rays_o = jnp.asarray(np.concatenate([rs.uniform(-1, 1, (Rb, 2)), np.full((Rb, 1), 4.0)], -1).astype(np.float32))
rays_d = jnp.asarray(np.tile(np.array([0, 0, -1.0], np.float32), (Rb, 1)))
step = 0.002


def stage_fn(stage):
    def fn(rays_o, rays_d, key):
        o_l = jnp.einsum("nij,rj->rni", inv_rot, rays_o) + inv_trans
        d_l = jnp.einsum("nij,rj->rni", inv_rot, rays_d)
        inv_dl = 1.0 / jnp.where(jnp.abs(d_l) < 1e-12, 1e-12, d_l)
        t_a = (b_0 - o_l) * inv_dl
        t_b = (b_1 - o_l) * inv_dl
        t0 = jnp.max(jnp.minimum(t_a, t_b), -1)
        t1 = jnp.min(jnp.maximum(t_a, t_b), -1)
        hit = (t0 < t1) & (t1 > 0) & (t0 < 100.0)
        t0c = jnp.clip(t0, 0.0, 100.0)
        t1c = jnp.clip(t1, 0.0, 100.0)
        if stage == "slab":
            return t0c.sum() + t1c.sum()

        tm, _, _ = _mt(rays_o, rays_d)
        t1c = jnp.minimum(t1c, tm[:, None])
        valid = hit & (t0c < t1c)
        if stage == "mesh":
            return t1c.sum() + valid.sum()

        score = jnp.where(valid, t0c, jnp.inf)
        neg, idx = jax.lax.top_k(-score, K)
        tk0 = jnp.where(jnp.isfinite(-neg), -neg, jnp.inf)
        tk1 = jnp.where(jnp.isfinite(tk0), jnp.take_along_axis(t1c, idx, -1), jnp.inf)
        if stage == "topk":
            return tk0.sum() + tk1.sum()

        times = jnp.concatenate([tk0, tk1], -1)
        kvalid = jnp.isfinite(tk0)
        deltas = jnp.concatenate([kvalid, -kvalid.astype(jnp.int32)], -1).astype(jnp.int32)
        order = jnp.argsort(times, -1)
        times_s = jnp.take_along_axis(times, order, -1)
        deltas_s = jnp.take_along_axis(deltas, order, -1)
        count = jnp.cumsum(deltas_s, -1)
        nxt = jnp.concatenate([times_s[:, 1:], times_s[:, -1:]], -1)
        gap = jnp.where(jnp.isfinite(nxt) & jnp.isfinite(times_s), nxt - times_s, 0.0)
        seg_len = jnp.where(count > 0, gap, 0.0)
        cum_incl = jnp.cumsum(seg_len, -1)
        cum_excl = cum_incl - seg_len
        total = cum_incl[:, -1]
        if stage == "events":
            return total.sum()

        u = jax.random.uniform(key, (Rb,))
        n_steps = jnp.minimum(jnp.floor(total / step).astype(jnp.int32), S)
        i_idx = jnp.arange(S)[None, :]
        s_arc = i_idx * step + (u * step)[:, None]
        j = jnp.sum(cum_incl[:, None, :] <= s_arc[:, :, None], axis=-1)
        j = jnp.clip(j, 0, 2 * K - 1)
        t_mu = jnp.take_along_axis(times_s, j, -1) + (s_arc - jnp.take_along_axis(cum_excl, j, -1))
        pts_w = rays_o[:, None, :] + rays_d[:, None, :] * t_mu[..., None]
        if stage == "placement":
            return pts_w.sum()

        active = kvalid[:, None, :] & (tk0[:, None, :] <= t_mu[..., None]) & (t_mu[..., None] < tk1[:, None, :])
        dist_k = jnp.linalg.norm(pts_w[:, :, None, :] - origins[idx][:, None, :, :], axis=-1)
        dist_k = jnp.where(active, dist_k, jnp.inf)
        sel_k = jnp.argmin(dist_k, -1)
        inst = jnp.take_along_axis(idx, sel_k, -1)
        if stage == "select":
            return inst.sum()

        rot = inv_rot[inst]
        pts_l = jnp.einsum("rsij,rsj->rsi", rot, pts_w) + inv_trans[inst]
        if stage == "transform":
            return pts_l.sum()
        raise ValueError(stage)

    return fn


def _mt(o, d):
    pvec = jnp.cross(d[..., None, :], tri_e2)
    det = jnp.sum(tri_e1 * pvec, -1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = o[..., None, :] - tri_v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, tri_e1)
    v = jnp.sum(d[..., None, :] * qvec, -1) * inv_det
    t = jnp.sum(tri_e2 * qvec, -1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < 100.0)
    tt = jnp.where(ok, t, jnp.inf)
    best = jnp.argmin(tt, -1)
    return jnp.take_along_axis(tt, best[:, None], -1)[:, 0], None, None


if __name__ == "__main__":
    stages = sys.argv[1:] or ["slab", "mesh", "topk", "events", "placement", "select", "transform"]
    for stage in stages:
        fn = jax.jit(stage_fn(stage))
        t0 = time.perf_counter()
        out = fn(rays_o, rays_d, jax.random.key(0))
        jax.block_until_ready(out)
        print(f"stage {stage:10s}: compile+run {time.perf_counter()-t0:7.1f}s", flush=True)

# warm-run timing appended by round-1 profiling
def warm_time(stage, n=5):
    fn = jax.jit(stage_fn(stage))
    out = fn(rays_o, rays_d, jax.random.key(0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(rays_o, rays_d, jax.random.key(i)); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n
