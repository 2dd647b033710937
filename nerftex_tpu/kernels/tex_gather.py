"""Pallas TPU kernel for the bilinear parameter-texture quad fetch.

The reference's CPU bilinear fetch (instancer.cpp:605-637) maps on TPU to a
random-row gather from the quad-packed texture (device.py
`_sample_channel_quads`), which XLA executes ~200x off the HBM roofline
(PERF.md 2.17: carpet `fusion.25` [327680,4] at 1.887 ms/exec; every
XLA-level re-formulation measured flat-or-worse, PERF.md 2.18).  The gather
is latency-bound on random rows — the fix is to stop gathering.

Design (TPU-first, no gathers at all):
  * Textures are 8-bit-PNG-derived, so every texel is exactly n/255
    (scene.py `load_texture_channels`).  The byte values 0..255 are exactly
    representable in bfloat16, so a one-hot bf16 MXU matmul against a byte
    table is a BIT-EXACT fetch — the accumulator adds one byte and 255
    zeros.
  * Samples stay in LANES end-to-end (lane-dense [M,128] int32 index
    planes; narrow [N,1] layouts pad 128x in HBM and were measured
    overhead-bound, and Mosaic cannot reshape lanes->sublanes in-kernel).
    The one-hot is built TRANSPOSED ([W,128] iota vs a broadcast index
    row — no reshape), and the dot runs table-side-major:
        r = tableT [2H, W] @ onehot [W, 128]  ->  [2H, 128]
    so r[v, s] = pair(x0[s], v) where pair packs the tex[x] and tex[x+1]
    rows.  One MXU pass fetches BOTH x-rows of the bilinear footprint for
    128 samples.
  * The 4 y-corners come out with iota==y masks + sublane reductions
    (exact: sums of zeros plus the selected byte) — no lane gather, no
    sublane gather.

The fetch costs 2H*W*128 MACs per 128 samples (85.9 GFLOP for a carpet
frame's 327,680-sample tier) — ~0.5 ms at v5e bf16 rates vs 1.887 ms for
the XLA gather.  The kernel returns the 4 corner byte-planes; the /255 and
the bilinear lerp stay in XLA in the caller's layout so the surrounding
fusion and the numerics match `_sample_channel_quads` exactly.

Gated by NERFTEX_PALLAS_TEX (see device.py); only used when every texture
channel round-trips bytes exactly (build_byte_tableT returns None
otherwise, e.g. float-valued or >256-wide textures).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def build_byte_tableT(channel):
    """Host-side: [W, H] float32 texture -> transposed byte pair-table
    [2H, W_pad] uint8, or None if the channel is not exactly byte-valued.

    Row v < H holds tex[:, v] of the x-row; row H+v holds the x+1-shifted
    copy (clamped at the last row, matching the quad pack in device.py).
    W is padded up to a lane multiple; padded x-columns are never selected
    by the one-hot (x0 <= w-2 < W).
    """
    c = np.asarray(channel, np.float32)
    if c.ndim != 2:
        return None
    b = np.round(c.astype(np.float64) * 255.0)
    if b.min() < 0 or b.max() > 255:
        return None
    b = b.astype(np.uint8)
    if not np.array_equal(b.astype(np.float32) / np.float32(255.0), c):
        return None
    w, h = b.shape
    if h > 4096 or w > 4096:
        return None  # table would not fit VMEM comfortably
    right = np.concatenate([b[1:], b[-1:]], 0)            # tex[x+1, :]
    pair = np.concatenate([b, right], 1)                  # [W, 2H]
    tbT = np.ascontiguousarray(pair.T)                    # [2H, W]
    w_pad = _round_up(w, 128)
    if w_pad > w:
        tbT = np.concatenate(
            [tbT, np.zeros((tbT.shape[0], w_pad - w), np.uint8)], 1
        )
    h_pad = _round_up(2 * h, 16) - 2 * h
    if h_pad:
        tbT = np.concatenate([tbT, np.zeros((h_pad, tbT.shape[1]), np.uint8)], 0)
    return tbT


def _quad_kernel(h, b_rows, x_ref, y_ref, tb_ref, o00, o01, o10, o11):
    x = x_ref[:]                                          # [B, 128] int32
    y = y_ref[:]
    tb = tb_ref[:]                                        # [2H, W] bf16 bytes
    w = tb.shape[1]
    iox = jax.lax.broadcasted_iota(jnp.int32, (w, 128), 0)
    ioy = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 0)
    for j in range(b_rows):
        xj = x[j : j + 1, :]                              # [1, 128]
        yj = y[j : j + 1, :]
        oh = (iox == xj).astype(jnp.bfloat16)             # [W, 128]
        r = jax.lax.dot_general(
            tb, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [2H, 128]
        r0 = r[:h]
        r1 = r[h : 2 * h]
        m0 = ioy == yj
        m1 = ioy == yj + 1
        z = jnp.zeros_like(r0)
        o00[j : j + 1, :] = jnp.sum(jnp.where(m0, r0, z), 0, keepdims=True)
        o01[j : j + 1, :] = jnp.sum(jnp.where(m1, r0, z), 0, keepdims=True)
        o10[j : j + 1, :] = jnp.sum(jnp.where(m0, r1, z), 0, keepdims=True)
        o11[j : j + 1, :] = jnp.sum(jnp.where(m1, r1, z), 0, keepdims=True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _quad_fetch(tableT, x0, y0, h, b_rows, interpret):
    """tableT [2H_pad, W_pad] bf16, x0/y0 [M,128] int32 ->
    4 corner byte-planes [M,128] f32 (c00, c01, c10, c11)."""
    m = x0.shape[0]
    kernel = functools.partial(_quad_kernel, h, b_rows)
    return pl.pallas_call(
        kernel,
        grid=(m // b_rows,),
        in_specs=[
            pl.BlockSpec((b_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tableT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, 128), jnp.float32)] * 4,
        interpret=interpret,
    )(x0, y0, tableT)


def sample_channel_quads_pallas(tableT, uv, dims, b_rows=8, interpret=None):
    """Drop-in for device.py `_sample_channel_quads`: bilinear fetch of the
    [W,H] channel behind `tableT` at uv (any leading shape, last dim 2).

    Index math, /255 and the lerp are the same XLA expressions as the
    gather path; only the 4-corner fetch itself runs in the kernel.
    `interpret=None` resolves to Mosaic on TPU, interpret mode elsewhere
    (the CPU test mesh).
    """
    if interpret is None:
        # "axon" is the tunneled TPU backend; everything else (the CPU test
        # mesh) runs the kernel in interpret mode.
        interpret = jax.default_backend() not in ("tpu", "axon")
    w, h = dims
    x = jnp.clip(uv[..., 0], 0, 1) * (w - 1)
    y = jnp.clip(uv[..., 1], 0, 1) * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    fx = x - x0
    fy = y - y0

    shape = x0.shape
    n = int(np.prod(shape))
    blk = b_rows * 128
    n_pad = _round_up(max(n, blk), blk)
    xf = jnp.reshape(x0, (n,))
    yf = jnp.reshape(y0, (n,))
    if n_pad > n:
        pad = jnp.zeros((n_pad - n,), jnp.int32)
        xf = jnp.concatenate([xf, pad])
        yf = jnp.concatenate([yf, pad])
    planes = _quad_fetch(
        tableT, xf.reshape(-1, 128), yf.reshape(-1, 128), h, b_rows, interpret
    )
    q = [jnp.reshape(p.reshape(-1)[:n], shape) / np.float32(255.0) for p in planes]
    c0 = q[0] * (1 - fy) + q[1] * fy
    c1 = q[2] * (1 - fy) + q[3] * fy
    return c0 * (1 - fx) + c1 * fx
