"""On-chip microbench of the per-sample select/count formulations.

The round-4 plush trace (runlogs/round4/trace_plush.txt) shows the
per-sample segment machinery far off roofline per execution:
  - convert_reduce_fusion.35 (the j segment count, S=320 tier): 11.0 ms per
    execution for [2048,320,256]x~2 ops = ~30 Gop/s vs ~1 Top/s VPU;
  - select_reduce_fusion.24 (the [Rb,S,23] hit-table select): ~4 ms/exec.
This script times candidate re-formulations of those exact computations at
plush block dims on the real chip, each as ONE fused device program
(fori_loop of R repeats, block once — CLAUDE.md benchmark discipline), and
asserts each variant is bit-identical to the baseline before timing.

Usage: PYTHONPATH=/root/repo python scripts/micro_select.py [--reps 20]
"""

import argparse
import time

import numpy as np


def bench(name, fn, args, reps, pert_idx=0):
    """Time reps fused iterations of fn in ONE device program.

    Loop-invariant hoisting trap: a fori_loop whose body recomputes
    fn(constant args) gets hoisted by XLA.  Each iteration instead adds the
    previous output scaled to ~1e-38 to args[pert_idx] — a data dependence
    XLA cannot fold away, but an EXACT f32 identity for any operand
    magnitude above ~1e-14, so every iteration computes bit-identical
    values.  The carry reduces over EVERY output element: a carry built
    from out[0,0] alone lets XLA slice the whole iteration down to one
    element (observed: "count base 0.006 ms", "selk 0.008 ms" — fake).
    The full reduce adds one cheap pass over the output, equal across
    variants."""
    import jax
    import jax.numpy as jnp

    def run(a):
        def body(i, c):
            out = fn(*[x + c if j == pert_idx else x for j, x in enumerate(a)])
            tot = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return tot * jnp.float32(1e-38)

        last = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return fn(*a), last  # final eval for the equality check; keep `last`

    f = jax.jit(run)
    out = jax.block_until_ready(f(args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(args))
    dt = (time.perf_counter() - t0) / (reps + 1)
    print(f"  {name:28s} {dt * 1e3:8.3f} ms/iter", flush=True)
    return out[0], dt


def check_equal(tag, a, b):
    """Variant equivalence check, tolerant to XLA's per-graph fma-contraction
    choices: different graphs may fuse `i*step + t_off` differently, moving
    s_arc by 1 ulp and flipping boundary comparisons.  The microbench is for
    TIMING — integration-level exactness is pinned by the device.py gate
    tests — so assert only that mismatches are rare boundary cases."""
    a = jax.tree.leaves(a)
    b = jax.tree.leaves(b)
    clean = True
    for x, y in zip(a, b):
        x, y = np.asarray(x), np.asarray(y)
        if np.issubdtype(x.dtype, np.floating):
            # Different graphs contract i*step+t_off into fma differently;
            # the 1-ulp s_arc shift amplifies through the final cancelling
            # add.  Timing bench: require closeness at absolute input scale.
            ok = np.isclose(x, y, atol=2e-6, rtol=1e-5, equal_nan=True)
            frac = float(np.mean(x != y))
            if frac:
                clean = False
                print(f"  {tag}: {frac * 100:.3f}% differ (fma boundary), "
                      f"{(1 - np.mean(ok)) * 100:.5f}% beyond tolerance")
            assert np.mean(ok) > 0.999, f"{tag}: diverges beyond fma noise"
        else:
            frac = float(np.mean(x != y))
            mx = int(np.max(np.abs(x.astype(np.int64) - y.astype(np.int64))))
            if frac:
                clean = False
                print(f"  {tag}: {frac * 100:.4f}% int flips, max |d| {mx}")
            assert frac < 1e-3 and mx <= 1, f"{tag}: int divergence beyond boundary"
    if clean:
        print(f"  {tag}: bit-identical ok")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rb", type=int, default=2048)
    ap.add_argument("--s", type=int, default=320)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--d", type=int, default=23)
    ap.add_argument("--groups", default="123",
                    help="which benchmark groups to run, e.g. 124")
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    Rb, S, K, D = args.rb, args.s, args.k, args.d
    K2 = 2 * K
    rs = np.random.RandomState(0)

    # Sorted event times per ray (like cum_incl), plus corr values.
    cum = np.sort(rs.rand(Rb, K2).astype(np.float32) * 3.0, axis=1)
    corr = rs.randn(Rb, K2).astype(np.float32)
    t_off = (0.001 + rs.rand(Rb, 1) * 0.01).astype(np.float32)
    step = np.float32(0.002)
    table = rs.randn(Rb, K, D).astype(np.float32)
    sel_k = rs.randint(0, K, (Rb, S)).astype(np.int32)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    cum, corr, t_off, table, sel_k = map(put, (cum, corr, t_off, table, sel_k))

    print(f"dims: Rb={Rb} S={S} K={K} 2K={K2} D={D}, reps={args.reps}, "
          f"dev={dev.platform}")

    # ---- group 1: segment count j = sum(cum <= s_arc) ------------------
    def s_arc_of(t_off):
        i = jnp.arange(S, dtype=jnp.float32)[None, :]
        return i * step + t_off

    def count_base(cum, t_off):
        s_arc = s_arc_of(t_off)
        return jnp.sum(cum[:, None, :] <= s_arc[..., None], axis=-1,
                       dtype=jnp.int32)

    def count_sminor(cum, t_off):
        s_arc = s_arc_of(t_off)
        return jnp.sum(cum[:, :, None] <= s_arc[:, None, :], axis=1,
                       dtype=jnp.int32)

    def count_loop(cum, t_off):
        s_arc = s_arc_of(t_off)

        def body(k, acc):
            return acc + (
                jax.lax.dynamic_slice_in_dim(cum, k, 1, 1) <= s_arc
            ).astype(jnp.int32)

        return jax.lax.fori_loop(0, K2, body, jnp.zeros((Rb, S), jnp.int32))

    if "1" in args.groups:
        print("-- segment count --")
        base, _ = bench("count base (K-minor)", count_base, (cum, t_off), args.reps)
        v, _ = bench("count S-minor", count_sminor, (cum, t_off), args.reps)
        check_equal("count S-minor", base, v)
        v, _ = bench("count fori-loop", count_loop, (cum, t_off), args.reps)
        check_equal("count fori", base, v)

    # ---- group 2: corr pick t_mu = s_arc + corr[j] ----------------------
    def pick_base(cum, corr, t_off):
        s_arc = s_arc_of(t_off)
        j = jnp.clip(count_base(cum, t_off), 0, K2 - 1)
        oh = j[..., None] == jnp.arange(K2)[None, None, :]
        return s_arc + jnp.sum(jnp.where(oh, corr[:, None, :], 0.0), -1)

    def pick_sminor(cum, corr, t_off):
        s_arc = s_arc_of(t_off)
        j = jnp.clip(count_sminor(cum, t_off), 0, K2 - 1)
        oh = j[:, None, :] == jnp.arange(K2)[None, :, None]
        return s_arc + jnp.sum(jnp.where(oh, corr[:, :, None], 0.0), 1)

    def pick_runsel(cum, corr, t_off):
        # Running select over ascending events: cum sorted per row, so the
        # last k with cum[k] <= s_arc leaves corr[min(k+1, 2K-1)] — exactly
        # corr[clip(count, 0, 2K-1)].  (clip(count,0,..) == count here since
        # count >= 0; the upper clip is the min() in the index.)
        s_arc = s_arc_of(t_off)

        def body(k, acc):
            c_k = jax.lax.dynamic_slice_in_dim(cum, k, 1, 1)
            nxt = jnp.minimum(k + 1, K2 - 1)
            v_k = jax.lax.dynamic_slice_in_dim(corr, nxt, 1, 1)
            return jnp.where(c_k <= s_arc, v_k, acc)

        init = jnp.broadcast_to(corr[:, 0:1], (Rb, S))
        return s_arc + jax.lax.fori_loop(0, K2, body, init)

    if "2" in args.groups:
        print("-- corr pick --")
        base, _ = bench("pick base (K-minor)", pick_base, (cum, corr, t_off), args.reps)
        v, _ = bench("pick S-minor", pick_sminor, (cum, corr, t_off), args.reps)
        check_equal("pick S-minor", base, v)
        v, _ = bench("pick running-select", pick_runsel, (cum, corr, t_off), args.reps)
        check_equal("pick running-select", base, v)

    # ---- group 3: hit-table select vals = table[sel_k] ------------------
    def vals_base(table, sel_k):
        oh = sel_k[..., None] == jnp.arange(K)[None, None, :]
        return jnp.sum(
            jnp.where(oh[..., None], table[:, None, :, :], 0.0), -2
        )

    def vals_sminor(table, sel_k):
        oh = sel_k[:, None, :] == jnp.arange(K)[None, :, None]        # [Rb,K,S]
        return jnp.sum(
            jnp.where(oh[:, :, :, None], table[:, :, None, :], 0.0), 1
        )

    def vals_dmajor(table, sel_k):
        # D-major output: select each channel separately ([Rb,S] planes).
        oh = sel_k[..., None] == jnp.arange(K)[None, None, :]         # [Rb,S,K]
        outs = [
            jnp.sum(jnp.where(oh, table[:, None, :, d], 0.0), -1)
            for d in range(D)
        ]
        return jnp.stack(outs, -1)

    if "3" in args.groups:
        print("-- hit-table select --")
        base, _ = bench("vals base [Rb,S,K,D]", vals_base, (table, sel_k), args.reps)
        v, _ = bench("vals S-minor [Rb,K,S,D]", vals_sminor, (table, sel_k), args.reps)
        check_equal("vals S-minor", base, v)
        v, _ = bench("vals per-channel planes", vals_dmajor, (table, sel_k), args.reps)
        check_equal("vals per-channel", base, v)

    # ---- group 4: overlap resolution (active set -> sel_k, weight) ------
    # Mirrors _per_sample_grid's nearest_blend chain: the [Rb,S,K] active /
    # distance / blend-cumsum machinery that lives inside the big tier
    # fusions (the select_reduce family, PERF §2.13).
    tk0v = np.sort(rs.rand(Rb, K).astype(np.float32) * 3.0, axis=1)
    tk1v = tk0v + 0.1 + rs.rand(Rb, K).astype(np.float32) * 0.4
    kvalid = (np.arange(K)[None, :] < rs.randint(1, K + 1, (Rb, 1)))
    sel_a = (rs.rand(Rb, K).astype(np.float32) * 4.0)
    sel_b = rs.randn(Rb, K).astype(np.float32)
    t_pt = np.sort(rs.rand(Rb, S).astype(np.float32) * 3.0, axis=1)
    u_sel = rs.rand(Rb, S).astype(np.float32)
    blend_range = np.float32(0.05)
    tk0v, tk1v, kvalid, sel_a, sel_b, t_pt, u_sel = map(
        put, (tk0v, tk1v, kvalid, sel_a, sel_b, t_pt, u_sel))

    def selk_base(tk0, tk1, kv, sa, sb, tp, u):
        tk0 = tk0[:, None, :]
        tk1 = tk1[:, None, :]
        kv = kv[:, None, :]
        tpx = tp[..., None]
        active = kv & (tk0 <= tpx) & (tpx < tk1)
        n_active = jnp.sum(active, -1)
        iv = jnp.maximum(tk0 - tpx, tpx - tk1)
        iv = jnp.where(kv, jnp.maximum(iv, 0.0), jnp.inf)
        fb = jnp.argmin(iv, -1)
        active = jnp.where((n_active == 0)[..., None],
                           jax.nn.one_hot(fb, K, dtype=bool), active)
        d2 = sa[:, None, :] + 2.0 * tpx * sb[:, None, :] + (tp * tp)[..., None]
        d2 = jnp.where(active, jnp.maximum(d2, 0.0), jnp.inf)
        dist = jnp.where(active, jnp.sqrt(d2), jnp.inf)
        min_d = jnp.min(dist, -1, keepdims=True)
        w = jnp.where(active, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0)
        prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
        cum2 = jnp.cumsum(prob, -1)
        sel = jnp.clip(jnp.sum((u[..., None] > cum2).astype(jnp.int32), -1), 0, K - 1)
        return sel, jnp.maximum(n_active, 1)

    def selk_sminor(tk0, tk1, kv, sa, sb, tp, u):
        # [Rb, K, S] orientation: reductions over axis 1, S on lanes.
        tk0 = tk0[:, :, None]
        tk1 = tk1[:, :, None]
        kv = kv[:, :, None]
        tpx = tp[:, None, :]
        active = kv & (tk0 <= tpx) & (tpx < tk1)
        n_active = jnp.sum(active, 1)
        iv = jnp.maximum(tk0 - tpx, tpx - tk1)
        iv = jnp.where(kv, jnp.maximum(iv, 0.0), jnp.inf)
        fb = jnp.argmin(iv, 1)
        oh_fb = jnp.arange(K)[None, :, None] == fb[:, None, :]
        active = jnp.where((n_active == 0)[:, None, :], oh_fb, active)
        d2 = sa[:, :, None] + 2.0 * tpx * sb[:, :, None] + (tp * tp)[:, None, :]
        d2 = jnp.where(active, jnp.maximum(d2, 0.0), jnp.inf)
        dist = jnp.where(active, jnp.sqrt(d2), jnp.inf)
        min_d = jnp.min(dist, 1, keepdims=True)
        w = jnp.where(active, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0)
        prob = w / jnp.maximum(jnp.sum(w, 1, keepdims=True), 1e-20)
        cum2 = jnp.cumsum(prob, 1)
        sel = jnp.clip(jnp.sum((u[:, None, :] > cum2).astype(jnp.int32), 1), 0, K - 1)
        return sel, jnp.maximum(n_active, 1)

    if "4" in args.groups:
        print("-- overlap resolution (nearest_blend sel_k) --")
        g4 = (tk0v, tk1v, kvalid, sel_a, sel_b, t_pt, u_sel)
        base, _ = bench("selk base (K-minor)", selk_base, g4, args.reps)
        v, _ = bench("selk S-minor", selk_sminor, g4, args.reps)
        check_equal("selk S-minor", base, v)

    # ---- group 5: producer-layout sensitivity ---------------------------
    # In-frame the count's input arrives from cumsum/sort along the LAST
    # axis — scan ops whose preferred layout is ray-minor {0,1} (trace
    # operands f32[2048,128]{0,1}) — while groups 1-4 feed device_put
    # row-major {1,0} arrays.  Reproduce the in-frame producer (cumsum ->
    # count/pick in one graph) and time the forced-rowmajor fix: flatten
    # through an optimization_barrier (a [R,C]{0,1} -> [R*C]{0} reshape is a
    # physical relayout, the reshape back is a bitcast; the barrier stops
    # the simplifier folding the pair) — pure data movement, bit-exact.
    seg = np.diff(np.concatenate([np.zeros((Rb, 1), np.float32), np.asarray(cum)], 1), axis=1)
    seg = put(np.ascontiguousarray(seg))

    def force_rowmajor(x):
        return jax.lax.optimization_barrier(x.reshape(-1)).reshape(x.shape)

    def count_prod(seg, t_off):
        return count_base(jnp.cumsum(seg, -1), t_off)

    def count_prod_fix(seg, t_off):
        return count_base(force_rowmajor(jnp.cumsum(seg, -1)), t_off)

    def pick_prod(seg, corr, t_off):
        return pick_base(jnp.cumsum(seg, -1), corr, t_off)

    def pick_prod_fix(seg, corr, t_off):
        cum2 = force_rowmajor(jnp.cumsum(seg, -1))
        return pick_base(cum2, force_rowmajor(corr + 0.0 * cum2), t_off)

    if "5" in args.groups:
        print("-- producer layout (cumsum -> count/pick) --")
        base, _ = bench("count cumsum-fed", count_prod, (seg, t_off), args.reps)
        v, _ = bench("count cumsum-fed + rowmajor", count_prod_fix,
                     (seg, t_off), args.reps)
        check_equal("count rowmajor fix", base, v)
        base, _ = bench("pick cumsum-fed", pick_prod, (seg, corr, t_off), args.reps)
        v, _ = bench("pick cumsum-fed + rowmajor", pick_prod_fix,
                     (seg, corr, t_off), args.reps)
        check_equal("pick rowmajor fix", base, v)

    # ---- group 6: interval-membership pick (no count intermediate) ------
    # corr[clip(count, 0, 2K-1)] selects index k exactly when s_arc lands in
    # [cum[k-1], cum[k]) (with cum[-1] = -inf and the last interval extended
    # to +inf by the clip) — so the pick can be ONE where/sum reduce over
    # the interval-membership mask, skipping the materialized s32 count and
    # the second one-hot compare entirely.  Ties (cum[k-1] == cum[k]) make
    # interval k empty, matching the count form's index skip — exactly one
    # true per (r,s), so the sum is still an exact one-term add.
    def pick_interval(cum, corr, t_off):
        s_arc = s_arc_of(t_off)
        ninf = jnp.full_like(cum[:, :1], -jnp.inf)
        pinf = jnp.full_like(cum[:, :1], jnp.inf)
        lo = jnp.concatenate([ninf, cum[:, :-1]], -1)
        hi = jnp.concatenate([cum[:, :-1], pinf], -1)
        sx = s_arc[..., None]
        inb = (lo[:, None, :] <= sx) & (sx < hi[:, None, :])
        return s_arc + jnp.sum(jnp.where(inb, corr[:, None, :], 0.0), -1)

    def pick_interval_prod(seg, corr, t_off):
        return pick_interval(jnp.cumsum(seg, -1), corr, t_off)

    def pick_interval_prod_fix(seg, corr, t_off):
        cum2 = force_rowmajor(jnp.cumsum(seg, -1))
        return pick_interval(cum2, force_rowmajor(corr + 0.0 * cum2), t_off)

    if "6" in args.groups:
        print("-- interval-membership pick --")
        base, _ = bench("pick cumsum-fed (count form)", pick_prod,
                        (seg, corr, t_off), args.reps)
        v, _ = bench("pick interval cumsum-fed", pick_interval_prod,
                     (seg, corr, t_off), args.reps)
        check_equal("pick interval", base, v)
        v, _ = bench("pick interval + rowmajor", pick_interval_prod_fix,
                     (seg, corr, t_off), args.reps)
        check_equal("pick interval rowmajor", base, v)


if __name__ == "__main__":
    main()
