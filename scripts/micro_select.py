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

    # ---- group 7: sel_k chain re-formulations ---------------------------
    # The round-4m plush trace still shows the nearest_blend chain at
    # 10.97 ms/exec (convert_reduce_fusion.26, S=320 K=128 tier) — ~100x
    # off VPU roofline for ~840 Mop.  Group 4 showed orientation doesn't
    # matter; these variants probe WHERE the time goes and whether breaking
    # the mega-fusion (barrier splits) or streaming K in chunks (bounded
    # working set, some recompute) buys anything.  Probes marked (*) are
    # NOT candidate adoptions (they skip work); they bound the chain's cost
    # structure.
    def _selk_stages(tk0, tk1, kv, sa, sb, tp, u, barrier=False):
        bar = jax.lax.optimization_barrier if barrier else (lambda x: x)
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
        active = bar(active)
        d2 = sa[:, None, :] + 2.0 * tpx * sb[:, None, :] + (tp * tp)[..., None]
        d2 = jnp.where(active, jnp.maximum(d2, 0.0), jnp.inf)
        dist = jnp.where(active, jnp.sqrt(d2), jnp.inf)
        dist = bar(dist)
        min_d = jnp.min(dist, -1, keepdims=True)
        w = jnp.where(active, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0)
        w = bar(w)
        prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
        cum2 = jnp.cumsum(prob, -1)
        sel = jnp.clip(jnp.sum((u[..., None] > cum2).astype(jnp.int32), -1), 0, K - 1)
        return sel, jnp.maximum(n_active, 1)

    def selk_barrier(tk0, tk1, kv, sa, sb, tp, u):
        return _selk_stages(tk0, tk1, kv, sa, sb, tp, u, barrier=True)

    def selk_chunked(tk0, tk1, kv, sa, sb, tp, u, Kc=32):
        """Stream K in chunks: 4 passes with [Rb,S] carries and a
        [Rb,S,Kc] working set; recomputes active/dist per pass.  Sum/cumsum
        re-association can flip boundary samples (epsilon-level)."""
        nC = K // Kc
        tpx = tp[..., None]
        tp2 = tp * tp

        def chunk(c, f):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * Kc, Kc, 1)
            return f(sl(tk0)[:, None, :], sl(tk1)[:, None, :],
                     sl(kv)[:, None, :], sl(sa)[:, None, :], sl(sb)[:, None, :])

        def act_of(t0, t1, k):
            return k & (t0 <= tpx) & (tpx < t1)

        # pass A: n_active, (min_iv, fb)
        def passA(c, carry):
            n_act, min_iv, fb = carry

            def f(t0, t1, k, a_, b_):
                act = act_of(t0, t1, k)
                iv = jnp.maximum(t0 - tpx, tpx - t1)
                iv = jnp.where(k, jnp.maximum(iv, 0.0), jnp.inf)
                civ = jnp.min(iv, -1)
                cfb = jnp.argmin(iv, -1) + c * Kc
                upd = civ < min_iv
                return (n_act + jnp.sum(act, -1),
                        jnp.where(upd, civ, min_iv),
                        jnp.where(upd, cfb, fb))

            return chunk(c, f)

        Rb_, S_ = tp.shape
        n_act, min_iv, fb = jax.lax.fori_loop(
            0, nC, passA,
            (jnp.zeros((Rb_, S_), jnp.int32), jnp.full((Rb_, S_), jnp.inf),
             jnp.zeros((Rb_, S_), jnp.int32)))
        no_act = n_act == 0

        def act2_of(t0, t1, k, c):
            act = act_of(t0, t1, k)
            oh_fb = (fb[..., None] == (jnp.arange(Kc) + c * Kc)[None, None, :])
            return jnp.where(no_act[..., None], oh_fb, act)

        # pass B: min_d
        def passB(c, min_d):
            def f(t0, t1, k, a_, b_):
                act = act2_of(t0, t1, k, c)
                d2 = a_ + 2.0 * tpx * b_ + tp2[..., None]
                dist = jnp.where(act, jnp.sqrt(jnp.where(act, jnp.maximum(d2, 0.0), jnp.inf)), jnp.inf)
                return jnp.minimum(min_d, jnp.min(dist, -1))

            return chunk(c, f)

        min_d = jax.lax.fori_loop(0, nC, passB, jnp.full((Rb_, S_), jnp.inf))

        def w_of(t0, t1, k, a_, b_, c):
            act = act2_of(t0, t1, k, c)
            d2 = a_ + 2.0 * tpx * b_ + tp2[..., None]
            dist = jnp.where(act, jnp.sqrt(jnp.where(act, jnp.maximum(d2, 0.0), jnp.inf)), jnp.inf)
            return jnp.where(act, jnp.maximum(blend_range + min_d[..., None] - dist, 0.0), 0.0)

        # pass C1: w_sum
        def passC1(c, wsum):
            return wsum + chunk(c, lambda *a: jnp.sum(w_of(*a, c), -1))

        wsum = jax.lax.fori_loop(0, nC, passC1, jnp.zeros((Rb_, S_), jnp.float32))
        wsum = jnp.maximum(wsum, 1e-20)

        # pass C2: sel count over cum2
        def passC2(c, carry):
            cumw, count = carry

            def f(t0, t1, k, a_, b_):
                w = w_of(t0, t1, k, a_, b_, c)
                cum_c = cumw[..., None] + jnp.cumsum(w / wsum[..., None], -1)
                return (cum_c[..., -1],
                        count + jnp.sum((u[..., None] > cum_c).astype(jnp.int32), -1))

            return chunk(c, f)

        _, count = jax.lax.fori_loop(
            0, nC, passC2,
            (jnp.zeros((Rb_, S_), jnp.float32), jnp.zeros((Rb_, S_), jnp.int32)))
        return jnp.clip(count, 0, K - 1), jnp.maximum(n_act, 1)

    def selk_probe_noiv(tk0, tk1, kv, sa, sb, tp, u):
        """(*) probe: skip the iv/fallback stage entirely."""
        tk0x = tk0[:, None, :]
        tk1x = tk1[:, None, :]
        kvx = kv[:, None, :]
        tpx = tp[..., None]
        active = kvx & (tk0x <= tpx) & (tpx < tk1x)
        n_active = jnp.sum(active, -1)
        d2 = sa[:, None, :] + 2.0 * tpx * sb[:, None, :] + (tp * tp)[..., None]
        dist = jnp.where(active, jnp.sqrt(jnp.maximum(d2, 0.0)), jnp.inf)
        min_d = jnp.min(dist, -1, keepdims=True)
        w = jnp.where(active, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0)
        prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
        cum2 = jnp.cumsum(prob, -1)
        sel = jnp.clip(jnp.sum((u[..., None] > cum2).astype(jnp.int32), -1), 0, K - 1)
        return sel, jnp.maximum(n_active, 1)

    def selk_probe_nocum(tk0, tk1, kv, sa, sb, tp, u):
        """(*) probe: stop at w (no prob/cumsum/sel count)."""
        tk0x = tk0[:, None, :]
        tk1x = tk1[:, None, :]
        kvx = kv[:, None, :]
        tpx = tp[..., None]
        active = kvx & (tk0x <= tpx) & (tpx < tk1x)
        n_active = jnp.sum(active, -1)
        iv = jnp.maximum(tk0x - tpx, tpx - tk1x)
        iv = jnp.where(kvx, jnp.maximum(iv, 0.0), jnp.inf)
        fb = jnp.argmin(iv, -1)
        active = jnp.where((n_active == 0)[..., None],
                           jax.nn.one_hot(fb, K, dtype=bool), active)
        d2 = sa[:, None, :] + 2.0 * tpx * sb[:, None, :] + (tp * tp)[..., None]
        dist = jnp.where(active, jnp.sqrt(jnp.where(active, jnp.maximum(d2, 0.0), jnp.inf)), jnp.inf)
        min_d = jnp.min(dist, -1, keepdims=True)
        w = jnp.where(active, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0)
        return jnp.sum(w, -1), jnp.maximum(n_active, 1)

    if "7" in args.groups:
        print("-- sel_k chain re-formulations --")
        g4 = (tk0v, tk1v, kvalid, sel_a, sel_b, t_pt, u_sel)
        base, _ = bench("selk base", selk_base, g4, args.reps, pert_idx=5)
        v, _ = bench("selk barrier-split", selk_barrier, g4, args.reps, pert_idx=5)
        check_equal("selk barrier", base, v)
        v, _ = bench("selk chunked Kc=32", selk_chunked, g4, args.reps, pert_idx=5)
        check_equal("selk chunked", base, v)
        bench("(*) probe: no iv/fallback", selk_probe_noiv, g4, args.reps, pert_idx=5)
        bench("(*) probe: stop at w", selk_probe_nocum, g4, args.reps, pert_idx=5)


if __name__ == "__main__":
    main()
