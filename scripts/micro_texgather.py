"""On-chip microbench of the bilinear texture-fetch gather formulations.

The round-4m carpet trace (runlogs/round4m/trace_carpet.txt) shows the
quad-packed texture gather family ~200x off HBM roofline per execution:
  - fusion.25 ([327680,4] from quads [256,256,4], the S=320 tier):
    1.887 ms/exec x 11 execs; family total ~56 ms = 15.6% of the frame.
    327,680 fetches / 1.887 ms = 174 M fetches/s — latency-bound.
This script times candidate re-formulations of the exact
`_sample_channel_quads` computation (device.py:562) at carpet block dims
on the real chip, each as ONE fused device program (fori_loop of R
repeats, block once — CLAUDE.md benchmark discipline), and checks each
variant's output against the baseline before timing.

Usage: PYTHONPATH=/root/repo python scripts/micro_texgather.py [--reps 20]
"""

import argparse
import time

import numpy as np


def bench(name, fn, args, reps, pert_idx=0):
    """One fused program of `reps` data-chained iterations (see
    micro_select.bench for the anti-hoist + full-reduce-carry rationale)."""
    import jax
    import jax.numpy as jnp

    def run(a):
        def body(i, c):
            out = fn(*[x + c if j == pert_idx else x for j, x in enumerate(a)])
            tot = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return tot * jnp.float32(1e-38)

        last = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return fn(*a), last

    f = jax.jit(run)
    out = jax.block_until_ready(f(args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(args))
    dt = (time.perf_counter() - t0) / (reps + 1)
    print(f"  {name:28s} {dt * 1e3:8.3f} ms/iter", flush=True)
    return out[0], dt


def check_equal(tag, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    if np.array_equal(a, b):
        print(f"  {tag}: bit-identical ok")
        return
    ok = np.isclose(a, b, atol=1e-6, rtol=1e-6)
    frac = float(np.mean(a != b))
    print(f"  {tag}: {frac * 100:.4f}% differ, "
          f"{(1 - np.mean(ok)) * 100:.5f}% beyond tolerance")
    assert np.mean(ok) > 0.9999, f"{tag}: diverges"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rb", type=int, default=1024)
    ap.add_argument("--s", type=int, default=320)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--groups", default="12")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    Rb, S, W = args.rb, args.s, args.w
    H = W
    rs = np.random.RandomState(0)

    quads = rs.rand(W, H, 4).astype(np.float32)
    uv = rs.rand(Rb, S, 2).astype(np.float32)
    dev = jax.devices()[0]
    quads = jax.device_put(quads, dev)
    uv = jax.device_put(uv, dev)
    quads_flat = jnp.reshape(quads, (W * H, 4))
    planes = tuple(jnp.reshape(quads[..., c], (W * H,)) for c in range(4))
    planes_mat = jnp.reshape(jnp.transpose(quads, (2, 0, 1)), (4, W * H))

    print(f"dims: Rb={Rb} S={S} tex={W}x{H}x4, reps={args.reps}, "
          f"dev={dev.platform}")

    def _idx(uv):
        x = jnp.clip(uv[..., 0], 0, 1) * (W - 1)
        y = jnp.clip(uv[..., 1], 0, 1) * (H - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        return x0, y0, x - x0, y - y0

    def _lerp(q, fx, fy):
        c0 = q[..., 0] * (1 - fy) + q[..., 1] * fy
        c1 = q[..., 2] * (1 - fy) + q[..., 3] * fy
        return c0 * (1 - fx) + c1 * fx

    # ---- group 1: the bilinear quad fetch ------------------------------
    def fetch_base(uv, quads):
        x0, y0, fx, fy = _idx(uv)
        return _lerp(quads[x0, y0], fx, fy)          # 2D advanced indexing

    def fetch_flat(uv, quads_flat):
        x0, y0, fx, fy = _idx(uv)
        return _lerp(quads_flat[x0 * H + y0], fx, fy)  # 1D row gather

    def fetch_planes(uv, *planes):
        x0, y0, fx, fy = _idx(uv)
        flat = x0 * H + y0
        q = jnp.stack([p[flat] for p in planes], -1)  # 4 scalar-plane gathers
        return _lerp(q, fx, fy)

    def fetch_planes_nostack(uv, *planes):
        # Channel-major consumption: lerp directly from the 4 [Rb,S] planes
        # (no [Rb,S,4] restack — the narrow minor dim never materializes).
        x0, y0, fx, fy = _idx(uv)
        flat = x0 * H + y0
        g = [p[flat] for p in planes]
        c0 = g[0] * (1 - fy) + g[1] * fy
        c1 = g[2] * (1 - fy) + g[3] * fy
        return c0 * (1 - fx) + c1 * fx

    def fetch_take2d(uv, planes_mat):
        # One gather on [4, W*H] along axis 1 -> [4, Rb, S]
        x0, y0, fx, fy = _idx(uv)
        flat = x0 * H + y0
        g = jnp.take(planes_mat, flat, axis=1)
        c0 = g[0] * (1 - fy) + g[1] * fy
        c1 = g[2] * (1 - fy) + g[3] * fy
        return c0 * (1 - fx) + c1 * fx

    def fetch_sorted(uv, quads_flat):
        # Sort fetch indices per ray, gather with indices_are_sorted=True,
        # unsort.  Costs two [Rb,S] sorts; wins only if sorted gathers are
        # much faster.
        x0, y0, fx, fy = _idx(uv)
        flat = x0 * H + y0
        order = jnp.argsort(flat, axis=-1)
        inv = jnp.argsort(order, axis=-1)
        sf = jnp.take_along_axis(flat, order, -1)
        q = jax.vmap(lambda f: quads_flat.at[f].get(indices_are_sorted=True))(sf)
        q = jnp.take_along_axis(q, inv[..., None], 1)
        return _lerp(q, fx, fy)

    if "1" in args.groups:
        print("-- bilinear quad fetch --")
        base, _ = bench("quad 2D gather (base)", fetch_base, (uv, quads), args.reps)
        v, _ = bench("quad flat-row gather", fetch_flat, (uv, quads_flat), args.reps)
        check_equal("flat", base, v)
        v, _ = bench("4 plane gathers + stack", fetch_planes, (uv,) + planes, args.reps)
        check_equal("planes", base, v)
        v, _ = bench("4 plane gathers, no stack", fetch_planes_nostack,
                     (uv,) + planes, args.reps)
        check_equal("planes nostack", base, v)
        v, _ = bench("[4,WH] axis-1 take", fetch_take2d, (uv, planes_mat), args.reps)
        check_equal("take2d", base, v)
        v, _ = bench("sorted-idx gather", fetch_sorted, (uv, quads_flat), args.reps)
        check_equal("sorted", base, v)

    # ---- group 3: pallas one-hot MXU kernel (byte textures) -------------
    if "3" in args.groups:
        from nerftex_tpu.kernels.tex_gather import (
            build_byte_tableT,
            sample_channel_quads_pallas,
        )

        print("-- pallas one-hot kernel (byte texture) --")
        tex_b = rs.randint(0, 256, (W, H)).astype(np.float32) / np.float32(255.0)
        right = np.concatenate([tex_b[1:], tex_b[-1:]], 0)
        down = np.concatenate([tex_b[:, 1:], tex_b[:, -1:]], 1)
        right_down = np.concatenate([right[:, 1:], right[:, -1:]], 1)
        quads_b = jax.device_put(
            jnp.asarray(np.stack([tex_b, down, right, right_down], -1)))
        quads_b_flat = jnp.reshape(quads_b, (W * H, 4))
        tbT = jax.device_put(
            jnp.asarray(build_byte_tableT(tex_b)).astype(jnp.bfloat16))
        for tier, uv_t in (("S320", uv), ("S128", uv[:, :128])):
            print(f"  [{tier}]")
            base, _ = bench("quad 2D gather (base)", fetch_base,
                            (uv_t, quads_b), args.reps)
            v, _ = bench("quad flat-row gather", fetch_flat,
                         (uv_t, quads_b_flat), args.reps)
            for br in (8, 16, 32):
                def fn(uv, tbT, br=br):
                    return sample_channel_quads_pallas(tbT, uv, (W, H), b_rows=br)
                v, _ = bench(f"pallas onehot b_rows={br}", fn, (uv_t, tbT),
                             args.reps)
                check_equal(f"pallas br={br} {tier}", base, v)

    # ---- group 2: scaling with S (amortization check) -------------------
    if "2" in args.groups:
        print("-- S=128 tier --")
        uv_s = uv[:, :128]
        base, _ = bench("quad 2D gather (base)", fetch_base, (uv_s, quads), args.reps)
        v, _ = bench("quad flat-row gather", fetch_flat, (uv_s, quads_flat), args.reps)
        check_equal("flat S128", base, v)
        v, _ = bench("4 plane gathers, no stack", fetch_planes_nostack,
                     (uv_s,) + planes, args.reps)
        check_equal("planes nostack S128", base, v)


if __name__ == "__main__":
    main()
