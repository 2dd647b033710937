"""Pallas TPU kernel for the per-sample overlap-resolution (sel_k) chain.

The reference resolves overlapping instances per sample on the CPU walk
(instancer.cpp:498-560: active-interval test, nearest/random/nearest_blend
instance pick, blend-probability weight).  The TPU re-derivation evaluates
that chain data-parallel over [Rb, S, K] (device.py `_per_sample_grid`),
and after every XLA-level fix (barrier splits PERF.md 2.19, relayouts 2.16)
the fused chain still runs ~100x off the VPU roofline — 10.97 ms/exec at
the plush S=320/K=128 tier, ~488 ms (19%) of the plush frame (PERF.md
2.17/2.18): XLA materializes multiple [Rb,S,K] intermediates in HBM
between the fusions it refuses to merge (each is ~335 MB of traffic), and
the K-axis cumsum serializes what remains.

This kernel evaluates the WHOLE chain in VMEM with nothing [Rb,S,K]-shaped
ever touching HBM.  Layout (Mosaic requires every block's lane dim to be a
multiple of 128 or the full array dim): RAYS ride LANES in 128-wide
columns, K rides SUBLANES (full-dim blocks, so any K works), and SAMPLES
are the short unrolled row loop per program.  Inputs are the per-hit
tables ([Rb,K] -> transposed [K,Rb] once per block in XLA) plus the
per-sample t/u planes (transposed to [S,Rb]); outputs are the three
[S,Rb] planes the caller transposes back.  K-reductions are sublane
reduces and the K-cumsum is a log2(K) shift-masked-add scan
(`pltpu.roll`) — no gathers, no MXU needed, pure VPU at ~15 ops per
(sample, hit) element.

Numerics vs the XLA chain: every elementwise op is written identically;
reductions (min/sum) and the Hillis-Steele cumsum associate differently
than XLA's choices, so `u > cum` boundary comparisons can flip on ~ulp
knife edges (same family as the PARITY.md cross-graph fma notes).
tests/test_selk_kernel.py pins: all sel_k mismatches sit on provable
~1e-6 cum/dist knife edges, and p_sel/n_active match elementwise where
sel_k agrees.  In-frame exactness is pinned by the golden checks when the
device.py gate (NERFTEX_PALLAS_SELK) is flipped.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _sub_cumsum(x):
    """Inclusive cumsum along axis 0 (sublanes): Hillis-Steele shift-add.

    ceil(log2(K)) rounds of `x += roll(x, d) masked to rows >= d`.  Exact
    for integer-valued f32 below 2^24; ~1 ulp association noise otherwise.
    """
    n = x.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < n:
        sh = pltpu.roll(x, d, 0)
        x = x + jnp.where(iota >= d, sh, jnp.zeros_like(x))
        d *= 2
    return x


def _first_where(cond, iota_k, k):
    """Index of the first True along axis 0 (matches argmin/argmax
    first-match tie-breaking); k where none."""
    return jnp.min(jnp.where(cond, iota_k, k), axis=0, keepdims=True)


def _selk_kernel(method, blend_range, s_rows,
                 tk0_ref, tk1_ref, kv_ref, sa_ref, sb_ref, t_ref, u_ref,
                 sel_ref, p_ref, n_ref):
    K, RL = tk0_ref.shape
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, RL), 0)
    inf = jnp.float32(np.inf)
    tk0 = tk0_ref[:, :]                                      # [K, RL]
    tk1 = tk1_ref[:, :]
    valid = kv_ref[:, :] != 0
    if method != "random":
        sa = sa_ref[:, :]
        sb2 = 2.0 * sb_ref[:, :]
    for s in range(s_rows):
        t = t_ref[s : s + 1, :]                              # [1, RL]
        u = u_ref[s : s + 1, :]
        # active intervals ------------------------------------------------
        act = valid & (tk0 <= t) & (t < tk1)                 # [K, RL]
        n_act = jnp.sum(act.astype(jnp.int32), 0, keepdims=True)
        iv = jnp.maximum(tk0 - t, t - tk1)
        iv = jnp.where(valid, jnp.maximum(iv, 0.0), inf)
        min_iv = jnp.min(iv, 0, keepdims=True)
        fk = _first_where(iv == min_iv, iota_k, K)           # [1, RL]
        # Boolean algebra instead of jnp.where on bools: Mosaic can't lower
        # select_n to an i1 vector (i8->i1 truncation unsupported).
        no_act = n_act == 0
        act = (act & ~no_act) | ((iota_k == fk) & no_act)
        n_out = jnp.maximum(n_act, 1)

        if method == "random":
            rank = _sub_cumsum(act.astype(jnp.float32)).astype(jnp.int32) - 1
            target = jnp.minimum(
                jnp.floor(u * n_out.astype(jnp.float32)).astype(jnp.int32),
                n_out - 1,
            )
            sel = _first_where(act & (rank == target), iota_k, K)
            p = jnp.zeros_like(u)
        else:
            d2 = sa + t * sb2 + t * t
            d2 = jnp.where(act, jnp.maximum(d2, 0.0), inf)
            if method == "nearest":
                min_d2 = jnp.min(d2, 0, keepdims=True)
                sel = _first_where(d2 == min_d2, iota_k, K)
                p = jnp.zeros_like(u)
            else:  # nearest_blend
                dist = jnp.where(act, jnp.sqrt(d2), inf)
                min_d = jnp.min(dist, 0, keepdims=True)
                w = jnp.where(
                    act, jnp.maximum(blend_range + min_d - dist, 0.0), 0.0
                )
                prob = w / jnp.maximum(jnp.sum(w, 0, keepdims=True), 1e-20)
                cum = _sub_cumsum(prob)
                sel = jnp.sum((u > cum).astype(jnp.int32), 0, keepdims=True)
                sel = jnp.clip(sel, 0, K - 1)
                p = jnp.sum(
                    jnp.where(iota_k == sel, prob, 0.0), 0, keepdims=True
                )
        sel_ref[s : s + 1, :] = jnp.clip(sel, 0, K - 1)
        p_ref[s : s + 1, :] = p
        n_ref[s : s + 1, :] = n_out


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _selk_call(tk0T, tk1T, kvT, saT, sbT, t_p, u_p,
               method, blend_range, s_rows, lanes, interpret):
    K, rb = tk0T.shape
    s_pad = t_p.shape[0]
    kernel = functools.partial(_selk_kernel, method, blend_range, s_rows)
    # Grid order (ray-cols, s-rows): the inner s loop revisits the same
    # table block, so Mosaic keeps it VMEM-resident across the S sweep.
    tab = pl.BlockSpec((K, lanes), lambda c, s: (0, c), memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((s_rows, lanes), lambda c, s: (s, c),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rb // lanes, s_pad // s_rows),
        in_specs=[tab, tab, tab, tab, tab, plane, plane],
        out_specs=[plane, plane, plane],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, rb), jnp.int32),
            jax.ShapeDtypeStruct((s_pad, rb), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, rb), jnp.int32),
        ],
        interpret=interpret,
    )(tk0T, tk1T, kvT, saT, sbT, t_p, u_p)


def selk_resolve(tk0, tk1, kvalid, sel_a, sel_b, t_pt, u_sel,
                 method="nearest_blend", blend_range=0.0,
                 s_rows=8, lanes=128, interpret=None):
    """Fused overlap resolution: per-hit tables [Rb,K] + per-sample planes
    [Rb,S] -> (sel_k i32, p_sel f32, n_active i32), all [Rb,S].

    Semantics mirror device.py `_per_sample_grid`'s chain exactly (active
    mask with nearest-interval fallback, then the method's pick);  p_sel is
    the picked blend probability (zeros for nearest/random), n_active is
    the >=1-clamped count.  sel_a/sel_b may be None for method='random'.
    `interpret=None` resolves to Mosaic on TPU, interpret mode elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    rb, K = tk0.shape
    S = t_pt.shape[1]
    rb_pad = _round_up(rb, lanes)
    s_pad = _round_up(S, s_rows)

    def pad_tab(x, fill):
        x = jnp.asarray(x)
        if rb_pad > rb:
            x = jnp.concatenate(
                [x, jnp.full((rb_pad - rb, K), fill, x.dtype)], 0
            )
        return x.T  # [K, rb_pad]

    def pad_plane(x):
        x = jnp.asarray(x, jnp.float32).T  # [S, rb]
        if rb_pad > rb:
            x = jnp.concatenate([x, jnp.zeros((S, rb_pad - rb), x.dtype)], 1)
        if s_pad > S:
            x = jnp.concatenate(
                [x, jnp.zeros((s_pad - S, rb_pad), x.dtype)], 0
            )
        return x

    zeros = jnp.zeros((rb, K), jnp.float32)
    sa = zeros if sel_a is None else jnp.asarray(sel_a, jnp.float32)
    sb = zeros if sel_b is None else jnp.asarray(sel_b, jnp.float32)
    sel, p, n = _selk_call(
        pad_tab(jnp.asarray(tk0, jnp.float32), 0.0),
        pad_tab(jnp.asarray(tk1, jnp.float32), 0.0),
        pad_tab(jnp.asarray(kvalid, jnp.int32), 0),
        pad_tab(sa, 0.0),
        pad_tab(sb, 0.0),
        pad_plane(t_pt),
        pad_plane(u_sel),
        method, float(blend_range), s_rows, lanes, bool(interpret),
    )
    return sel[:S, :rb].T, p[:S, :rb].T, n[:S, :rb].T
