"""Device instancer: the Embree ray-marcher re-derived as data-parallel XLA.

Replaces the per-ray half of the reference's C++ instancer
(C_Instancer::GetModelInput, instancer.cpp:751-1037).  The serial active-set
walk becomes fixed-shape array algebra (SURVEY.md §7 stage 6):

  1. every ray is slab-tested against every instance's local unit box — the
     world-t entry/exit intervals replace Embree's multi-hit BVH events;
  2. top-K intervals per ray (K = max_hits, the MAX_TOTAL_HITS analogue;
     overflow is *counted*, instancer.cpp:22,1036) are clipped at the first
     mesh hit (Möller–Trumbore over the triangle soup);
  3. the union-of-intervals segment walk becomes sorted entry/exit events +
     prefix sums of inside-gap lengths; equal-arc-length sample positions map
     to world t by searchsorted over the cumulative inside length —
     closed-form replacement for the reference's segment_offset bookkeeping
     (instancer.cpp:866-1014);
  4. per-sample overlap resolution (random / nearest / nearest_blend,
     instancer.cpp:670-713) runs vectorized over the K candidates with
     per-sample PRNG; density weights match the reference's;
  5. local-frame transforms, closest-point texture parameter lookups (against
     per-instance candidate triangles baked by the scene compiler), shadow
     rays (sparse along the arc + nearest-neighbor assignment, like the
     reference's interpolation path, instancer.cpp:929-951) and the opaque
     mesh terminator (shadeMesh, instancer.cpp:716-743) are all batched.

Everything is jit-compiled per (rays, samples) shape; rays stream through a
lax.map over fixed-size blocks to bound live memory.  The host never sees a
sample — this is the round-trip the reference paid per chunk
(instancer.pyx:38-54) and the benchmark's north star removes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

# A/B kill switch for the packed per-instance table gather (docs/PERF.md
# §2.9): NERFTEX_PACKED_GATHER=0 falls back to piecewise per-column gathers.
_PACKED_GATHER = os.environ.get("NERFTEX_PACKED_GATHER", "1") != "0"

# A/B kill switch for interval top-K selection (docs/PERF.md §2.10):
# NERFTEX_TOPK_SELECT=0 falls back to the full 3-operand lax.sort.
_TOPK_SELECT = os.environ.get("NERFTEX_TOPK_SELECT", "1") != "0"

# A/B kill switch for the event-walk active count (docs/PERF.md §2.10):
# NERFTEX_EVENT_CUMSUM=0 falls back to O(K^2) compare-all counting.
_EVENT_CUMSUM = os.environ.get("NERFTEX_EVENT_CUMSUM", "1") != "0"

# Fold the per-ray anchor-distance coefficients into the interval top-K
# one-hot select instead of a separate [Rb,K,3] origins gather.  Requires
# _TOPK_SELECT.  Default ON since round 4: the round-3 A/B legs measured
# +3.1% carpet / +9.3% grass / +3.0% plush (docs/PERF.md §2.10,
# runlogs/round3_salvage/ab_round3b.log) and bit-exactness is test-pinned
# (tests/test_device_instancer.py::test_select_coefs_bitexact).
# NERFTEX_SELECT_COEFS=0 is the A/B kill switch.
_SELECT_COEFS = os.environ.get("NERFTEX_SELECT_COEFS", "1") != "0"

# Pack the occupancy sort's per-table row permutes into one gather per dtype
# group (docs/PERF.md §2.13).  TPU row gathers cost per-row overhead, not
# bytes — a [R,3] permute times like [R,96] because the minor dim pads to a
# full lane tile — so the sorted path's ~20 separate table permutes were
# ~13% of the round-4 carpet frame (runlogs/round4/trace_carpet.txt).
# NERFTEX_PACKED_PERMUTE=0 falls back to one gather per table.
_PACKED_PERMUTE = os.environ.get("NERFTEX_PACKED_PERMUTE", "1") != "0"

# Segment lookup as a running select over the ascending event list instead
# of the one-hot [.., S, 2K] count+pick: cum_incl is sorted per row, so a
# fori over the 2K events that overwrites the accumulator whenever
# cum_incl[k] <= s_arc leaves exactly corr[clip(count, 0, 2K-1)].  Measured
# 2.3x the one-hot form in isolation at plush dims (micro_select "pick",
# runlogs/round4f/queue.log).  Results can differ by 1 ulp of s_arc from the
# one-hot form ONLY through XLA's per-graph fma choice on i*step + t_off,
# not through the select itself.  NERFTEX_RUNSEL_WALK=1 enables.  Default
# OFF: despite the micro win, the in-frame A/B regressed plush 11%
# (200.9k vs 226.7k rays/s, runlogs/round4h/queue.log — the fori walk
# serializes against the rest of the block where the one-hot reduce
# overlaps it), and the DCE-proof micro rerun (runlogs/round4i) showed the
# original 2.3x was partly a sliced-carry artifact.
_RUNSEL_WALK = os.environ.get("NERFTEX_RUNSEL_WALK", "0") == "1"

# One-hot table selection emitted as D separate [.., S] channel reductions
# instead of one [.., S, K, D] virtual 4-D reduce: 1.6x in the DCE-proof
# micro at plush dims (runlogs/round4i/queue.log) and a win or neutral
# in-frame on every scene — plush +3.3%, grass +4.6%, carpet +0.4%,
# bench.py +2.4% (runlogs/round4h + round4j/queue.log).  Per-element
# arithmetic identical -> bit-exact
# (tests/test_sorted_render.py::test_dmajor_select_bitexact).
# Default ON; NERFTEX_DMAJOR_SELECT=0 is the kill switch.
_DMAJOR_SELECT = os.environ.get("NERFTEX_DMAJOR_SELECT", "1") != "0"

# Force the per-sample stage's event/hit tables into row-major layout
# before the [Rb,S,*] select/count fusions consume them.  The tables are
# produced by sort/cumsum along the LAST axis — scan ops whose preferred
# TPU layout is ray-minor {0,1} (trace operands f32[2048,128]{0,1},
# runlogs/round4/trace_plush.txt) — and XLA fuses the resulting transpose
# per-ELEMENT into every consumer reduce, which PERF §2.13 measured ~100x
# off roofline.  One materialized relayout per table per block amortizes
# it.  Pure data movement -> bit-exact
# (tests/test_sorted_render.py::test_event_relayout_bitexact).
# Default ON since the round-4l in-frame A/B (win-or-neutral everywhere:
# plush 236.4k->241.5k combined with INTERVAL_PICK, grass/carpet neutral-
# positive; runlogs/round4l/queue.log).  NERFTEX_EVENT_RELAYOUT=0 is the
# kill switch.
_EVENT_RELAYOUT = os.environ.get("NERFTEX_EVENT_RELAYOUT", "1") != "0"

# Segment lookup as ONE interval-membership where/sum instead of the
# materialized s32 count + one-hot pick pair: corr[clip(count, 0, 2K-1)]
# selects index k exactly when s lands in [cum[k-1], cum[k]) (cum[-1] =
# -inf; the clip extends the last interval to +inf), so the pick needs no
# count intermediate and no second compare pass.  Ties make interval k
# empty, matching the count form's index skip — exactly one true per
# (r,s), one-term add -> bit-exact (micro: 1.25x at plush dims,
# runlogs/round4l; tests/test_sorted_render.py::test_interval_pick_bitexact).
# Default ON since the round-4l in-frame A/B (combined with EVENT_RELAYOUT:
# plush +2.2%, grass +0.5%, carpet bench +1.4%; runlogs/round4l/queue.log).
# NERFTEX_INTERVAL_PICK=0 is the kill switch.
_INTERVAL_PICK = os.environ.get("NERFTEX_INTERVAL_PICK", "1") != "0"

# Split the overlap-resolution mega-fusion (active -> iv/fallback -> dist
# -> w -> cumsum over [Rb,S,K]) with optimization_barriers after the
# fallback-merged `active`, after `dist`, and after `w`.  XLA otherwise
# fuses the whole chain into one convert_reduce_fusion that re-walks the
# K axis per reduce (plush trace: 10.97 ms/exec at S=320 K=128, ~100x off
# VPU roofline — PERF §2.17); the barriers force the [Rb,S,K]
# intermediates to materialize once each, trading HBM traffic for
# recompute.  Barriers are value-identity, so this is bit-exact by
# construction (micro: 13.87 -> 8.52 ms at plush dims, 6.04 -> 4.69 ms at
# grass dims; runlogs/round4n/queue.log).  Default ON since the round-4o
# in-frame A/B: plush +9.5% (243.7k -> 266.9k rays/s), carpet bench
# +1.3%, grass neutral (runlogs/round4o/queue.log; PERF §2.19).
# NERFTEX_SELK_BARRIER=0 is the kill switch.
_SELK_BARRIER = os.environ.get("NERFTEX_SELK_BARRIER", "1") != "0"

# Fetch parameter textures with the Pallas one-hot MXU kernel
# (kernels/tex_gather.py) instead of the XLA row gather.  The gather is the
# carpet frame's top remaining heavy (~200x off HBM roofline, PERF §2.17)
# and every XLA re-formulation measured flat-or-worse (§2.18).  Only
# engages when every channel is exactly byte-valued (8-bit-PNG-derived —
# build_byte_tableT verifies) and dims are kernel-friendly; falls back to
# the gather otherwise.  The 4-corner fetch is bit-exact; the downstream
# /255+lerp can differ from the gather path by <=2 ulp (cross-graph fma
# contraction, see PARITY.md).  Default ON since round 5 (in-frame A/B:
# carpet +13-16%, plush +9.1%, grass +1.3%, PERF §2.20);
# NERFTEX_PALLAS_TEX=0 is the kill switch.
_PALLAS_TEX = os.environ.get("NERFTEX_PALLAS_TEX", "1") == "1"
_PALLAS_TEX_ROWS = int(os.environ.get("NERFTEX_PALLAS_TEX_ROWS", "8"))

# Evaluate the whole overlap-resolution chain (active -> fallback -> method
# pick -> blend probability) in one Pallas VPU kernel
# (kernels/selk_resolve.py) instead of the barrier-split XLA fusion chain:
# K rides sublanes, S rides lanes, and no [Rb,S,K]-shaped intermediate ever
# touches HBM (the XLA chain materializes several at ~335 MB each on the
# plush S=320/K=128 tier — PERF §2.17/§2.18).  sel_k can flip vs XLA only
# on ~1e-6 cum/dist knife edges (different reduce/cumsum association —
# tests/test_selk_kernel.py pins this); grid-path golden checks pin the
# in-frame result.  The round-5d in-frame A/B made this a PER-SCENE knob
# (docs/PERF.md §2.22): plush +2.9% (heavy nearest_blend overlap, S=320
# K=128) but carpet north-star -18.8% — so the default comes from the
# scene's adopted operating point (DeviceInstancer(pallas_selk=...),
# nerftex_tpu/operating_points.py) and the env var is an override/kill
# switch in either direction when set.
def _selk_enabled(config_default: bool) -> bool:
    env = os.environ.get("NERFTEX_PALLAS_SELK")
    if env is not None:
        return env == "1"
    return bool(config_default)

from nerftex_tpu.instancing.scene import Scene
from nerftex_tpu.ops.volume import mean_distance

T_FAR = 100.0

# Ceiling on the compact path's stacked flat-sample outputs.  The [B,3]
# pts/dirs (and [B,P] parameters) arrays lane-pad their minor dim to 128 on
# TPU — a 42x blowup — so a 262,144-ray chunk with budget 160 allocates
# 262144*160*128*4 B = 21.5 GB for pts alone at compile time (round-3 queue
# post-mortem, commit 3403a68).  Fail with an actionable message instead.
_COMPACT_MAX_BYTES = int(
    float(os.environ.get("NERFTEX_COMPACT_MAX_GB", "8")) * (1 << 30)
)


def _check_compact_capacity(n_rays_padded: int, budget_per_ray: int, n_params: int):
    """Estimate the lane-padded bytes of the compacted sample tables and
    refuse to build a program that would OOM at compile."""
    lane = 128
    b_total = n_rays_padded * budget_per_ray
    # pts + dirs ([B,3] -> 128 lanes) + parameters ([B,P] -> ceil to 128).
    cols = 2 * lane + -(-n_params // lane) * lane
    est = 4 * b_total * cols
    if est > _COMPACT_MAX_BYTES:
        raise ValueError(
            f"compact-path capacity: {n_rays_padded} rays x budget "
            f"{budget_per_ray} would lane-pad ~{est / (1 << 30):.1f} GiB of "
            f"flat sample tables (> {_COMPACT_MAX_BYTES / (1 << 30):.1f} GiB "
            f"cap). Lower render_chunk or sample_budget_per_ray, or raise "
            f"NERFTEX_COMPACT_MAX_GB."
        )


# Dtypes that pack exactly into a widened float32 / int32 column group: the
# widen-then-narrow round trip is value-preserving for every entry below.
_PACK_F = (jnp.float32, jnp.bfloat16, jnp.float16)
_PACK_I = (jnp.int32, jnp.bool_, jnp.int16, jnp.uint16, jnp.int8, jnp.uint8)


def _permute_rows_packed(order, leaves):
    """Reorder each [R, ...] array in `leaves` along axis 0 by `order`, using
    ONE row gather per dtype group instead of one gather per array.

    XLA row gathers on TPU cost per-row overhead rather than bytes: a [R,3]
    permute times the same as [R,96] (the minor dim pads to a full 128-lane
    tile), so the occupancy sort's per-table permutes — ~20 of them, five
    3-wide — added up to ~13% of the round-4 carpet frame
    (runlogs/round4/trace_carpet.txt, docs/PERF.md §2.13).  Packing float
    leaves into one [R, W_f] plane and integer/bool leaves into one [R, W_i]
    plane turns the whole permute into two gathers.

    Bit-exact: a gather is pure data movement; leaves are grouped BY KIND
    (floats widened to f32, ints/bools widened to i32 — both exact round
    trips) so no value ever crosses a float<->int representation boundary.
    Leaves of any other dtype fall back to a direct per-array gather.
    """
    out = [None] * len(leaves)
    groups = {"f": [], "i": []}
    for i, v in enumerate(leaves):
        if v.dtype in _PACK_F:
            groups["f"].append(i)
        elif v.dtype in _PACK_I:
            groups["i"].append(i)
        else:
            out[i] = v[order]
    n_rows = order.shape[0]
    for kind, idxs in groups.items():
        if not idxs:
            continue
        cast = jnp.float32 if kind == "f" else jnp.int32
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = leaves[i][order]
            continue
        cols, widths = [], []
        for i in idxs:
            flat = leaves[i].reshape(n_rows, -1)
            widths.append(flat.shape[1])
            cols.append(flat if flat.dtype == cast else flat.astype(cast))
        packed = jnp.concatenate(cols, axis=1)[order]
        off = 0
        for i, w in zip(idxs, widths):
            v = leaves[i]
            sl = jax.lax.slice_in_dim(packed, off, off + w, axis=1)
            out[i] = (sl if v.dtype == cast else sl.astype(v.dtype)).reshape(
                (n_rows,) + v.shape[1:]
            )
            off += w
    return out


# ---------------------------------------------------------------------------
# Scene data as a device pytree
# ---------------------------------------------------------------------------


class DeviceScene:
    """jnp mirror of the compiled Scene (+ static metadata)."""

    def __init__(self, scene: Scene):
        self.scene = scene
        f32 = jnp.float32

        n = scene.n_instances()
        self.n_instances = n
        inv = np.asarray(scene.inverse, np.float32).reshape(n, 4, 4)
        self.inv_rot = jnp.asarray(inv[:, :3, :3], f32)
        self.inv_trans = jnp.asarray(inv[:, :3, 3], f32)
        self.dir_inv = jnp.asarray(np.asarray(scene.dir_inverse, np.float32), f32)
        self.origins = jnp.asarray(np.asarray(scene.origins, np.float32), f32)
        self.b_0 = jnp.asarray(scene.b_0, f32)
        self.b_1 = jnp.asarray(scene.b_1, f32)


        # Triangle soup: base mesh (mesh_id 0) + aux meshes (1..).
        v0s, e1s, e2s, n_rows, uv_rows, mesh_ids = [], [], [], [], [], []
        meshes = ([scene.base_mesh] if scene.base_mesh is not None else []) + list(scene.aux_meshes)
        self.meshes = meshes
        for mid, mesh in enumerate(meshes):
            V, F = mesh.V, mesh.F
            if len(F) == 0:
                continue
            v0s.append(V[F[:, 0]])
            e1s.append(V[F[:, 1]] - V[F[:, 0]])
            e2s.append(V[F[:, 2]] - V[F[:, 0]])
            n_rows.append(np.stack([mesh.N[F[:, k]] for k in range(3)], 1))
            uv_rows.append(np.stack([mesh.UV[F[:, k]] for k in range(3)], 1))
            mesh_ids.append(np.full(len(F), mid, np.int32))
        if v0s:
            self.tri_v0 = jnp.asarray(np.concatenate(v0s), f32)
            self.tri_e1 = jnp.asarray(np.concatenate(e1s), f32)
            self.tri_e2 = jnp.asarray(np.concatenate(e2s), f32)
            self.tri_n = jnp.asarray(np.concatenate(n_rows), f32)       # [T,3,3]
            self.tri_uv = jnp.asarray(np.concatenate(uv_rows), f32)     # [T,3,2]
            self.tri_mesh_id = jnp.asarray(np.concatenate(mesh_ids))
            self.n_tris = int(self.tri_v0.shape[0])
            # Triangle bounding spheres for the block-fan cull.
            v0 = np.concatenate(v0s)
            e1 = np.concatenate(e1s)
            e2 = np.concatenate(e2s)
            cen = v0 + (e1 + e2) / 3.0
            rad = np.maximum(
                np.linalg.norm(cen - v0, axis=-1),
                np.maximum(
                    np.linalg.norm(cen - (v0 + e1), axis=-1),
                    np.linalg.norm(cen - (v0 + e2), axis=-1),
                ),
            )
            self.tri_center = jnp.asarray(cen, f32)
            self.tri_radius = jnp.asarray(rad, f32)
        else:
            self.n_tris = 0

        # Per-instance candidate triangles for texture lookups.
        if getattr(scene, "instance_tri_candidates", None) is not None and scene.base_mesh is not None:
            self.tri_candidates = jnp.asarray(scene.instance_tri_candidates)
            self.k_tri = int(self.tri_candidates.shape[1])
        else:
            self.tri_candidates = None
            self.k_tri = 0
        if getattr(scene, "anchor_uv", None) is not None:
            self.anchor_uv = jnp.asarray(scene.anchor_uv)
            self.uv_jacobian = jnp.asarray(scene.uv_jacobian)
        else:
            self.anchor_uv = None
            self.uv_jacobian = None

        # Parameter texture channels, padded to a common [C, W, H] and also
        # quad-packed [C, W, H, 4] (quad[x,y] = the 4 bilinear corners
        # (c[x,y], c[x,y+1], c[x+1,y], c[x+1,y+1])) so a bilinear fetch is
        # ONE row gather — scattered row gathers are the expensive primitive
        # on TPU, so corner count per row is free but row count is not.
        if scene.texture_channels:
            w = max(c.shape[0] for c in scene.texture_channels)
            h = max(c.shape[1] for c in scene.texture_channels)
            stack = np.zeros((len(scene.texture_channels), w, h), np.float32)
            self.tex_dims = []
            for i, c in enumerate(scene.texture_channels):
                stack[i, : c.shape[0], : c.shape[1]] = c
                self.tex_dims.append((c.shape[0], c.shape[1]))
            self.tex_channels = jnp.asarray(stack)
            right = np.concatenate([stack[:, 1:, :], stack[:, -1:, :]], 1)
            down = np.concatenate([stack[:, :, 1:], stack[:, :, -1:]], -1)
            right_down = np.concatenate([right[:, :, 1:], right[:, :, -1:]], -1)
            quads = np.stack([stack, down, right, right_down], -1)
            self.tex_quads = jnp.asarray(quads)  # [C, W, H, 4]
            # Byte pair-tables for the Pallas one-hot fetch (built from the
            # TRUE-dims channels; None disables per-scene when any channel
            # is not exactly 8-bit-valued or its height is sublane-odd).
            self.tex_tablesT = None
            if _PALLAS_TEX:
                from nerftex_tpu.kernels.tex_gather import build_byte_tableT

                tbs = [build_byte_tableT(c) for c in scene.texture_channels]
                if all(t is not None for t in tbs) and all(
                    h % 8 == 0 for (_, h) in self.tex_dims
                ):
                    self.tex_tablesT = [
                        jnp.asarray(t).astype(jnp.bfloat16) for t in tbs
                    ]
        else:
            self.tex_channels = None
            self.tex_quads = None
            self.tex_tablesT = None
            self.tex_dims = []

        # Aux albedo textures as [M, W, H, 3] (gray -> replicated), mesh_id
        # aligned with the soup ids (entry 0 = base, unused).
        self.mesh_tex = None
        self.mesh_tex_dims = []
        if meshes:
            tex_list = []
            any_tex = any(m.textures for m in meshes)
            if any_tex:
                w = max((c.shape[0] for m in meshes for c in m.textures), default=1)
                h = max((c.shape[1] for m in meshes for c in m.textures), default=1)
                for m in meshes:
                    arr = np.full((w, h, 3), -1.0, np.float32)  # -1 = untextured
                    if m.textures:
                        chans = m.textures if len(m.textures) >= 3 else [m.textures[0]] * 3
                        for c in range(3):
                            ch = chans[c]
                            arr[: ch.shape[0], : ch.shape[1], c] = ch
                    tex_list.append(arr)
                self.mesh_tex = jnp.asarray(np.stack(tex_list))
                self.mesh_tex_dims = [
                    (m.textures[0].shape if m.textures else (1, 1)) for m in meshes
                ]
            else:
                self.mesh_tex = None
                self.mesh_tex_dims = []

        # Per-instance bounding spheres (world space) for conservative
        # block-frustum culling: the 8 corners of the local patch box pushed
        # through each forward transform.
        if n:
            fwd = np.asarray(scene.forward, np.float32).reshape(n, 4, 4)
            b0 = np.asarray(scene.b_0, np.float32)
            b1 = np.asarray(scene.b_1, np.float32)
            corners = np.array(
                [[b0[0], b0[1], b0[2]], [b0[0], b0[1], b1[2]],
                 [b0[0], b1[1], b0[2]], [b0[0], b1[1], b1[2]],
                 [b1[0], b0[1], b0[2]], [b1[0], b0[1], b1[2]],
                 [b1[0], b1[1], b0[2]], [b1[0], b1[1], b1[2]]], np.float32)
            wc = np.einsum("nij,kj->nki", fwd[:, :3, :3], corners) + fwd[:, None, :3, 3]
            center = wc.mean(1)
            radius = np.linalg.norm(wc - center[:, None], axis=-1).max(1)
            self.inst_center = jnp.asarray(center, f32)
            self.inst_radius = jnp.asarray(radius, f32)

        # If every instance is a uniformly-scaled rotation (the mesh
        # placement path always is), dir_inv == inv_rot * patch-scale and the
        # per-sample dir_inv gather can reuse the inv_rot gather.
        self.uniform_scale = None
        if n:
            scales = np.linalg.norm(np.asarray(scene.forward)[:, :3, 0], axis=-1)
            dir_from_inv = inv[:, :3, :3] * scales[:, None, None]
            if (np.abs(scales - scales[0]) < 1e-5 * max(scales[0], 1e-9)).all() and np.abs(
                dir_from_inv - np.asarray(scene.dir_inverse, np.float32)
            ).max() < 1e-4:
                self.uniform_scale = float(scales[0])

        # Static metadata.
        self.patch_scale = float(scene.patch_scale)
        self.light_dir_idx = int(scene.light_dir_idx)
        self.light_strength_idx = int(scene.light_strength_idx)
        self.texture_parameter_idxs = tuple(scene.texture_parameter_idxs)
        self.cast_shadow_rays = bool(scene.cast_shadow_rays)
        self.use_mean_distance = bool(scene.use_mean_distance)
        self.instance_sampling_method = scene.instance_sampling_method
        self.nearest_blend_range = 0.2 * self.patch_scale


# ---------------------------------------------------------------------------
# jnp geometry helpers
# ---------------------------------------------------------------------------


def _closest_point_tri_jnp(p, a, b, c):
    """Batched exact point-triangle closest point -> barycentric [..., 3].
    jnp twin of scene.closest_point_triangles (instancer.cpp:154-198)."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    eps = 1e-20

    def guard(x):
        return jnp.where(jnp.abs(x) < eps, eps, x)

    denom = 1.0 / guard(va + vb + vc)
    v_in = vb * denom
    w_in = vc * denom
    v_ab = d1 / guard(d1 - d3)
    v_ac = d2 / guard(d2 - d6)
    v_bc = (d4 - d3) / guard((d4 - d3) + (d5 - d6))

    zero = jnp.zeros_like(d1)
    one = jnp.ones_like(d1)

    bary = jnp.stack([1 - v_in - w_in, v_in, w_in], -1)
    bary = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None],
                     jnp.stack([zero, 1 - v_bc, v_bc], -1), bary)
    bary = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None],
                     jnp.stack([1 - v_ac, zero, v_ac], -1), bary)
    bary = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None],
                     jnp.stack([1 - v_ab, v_ab, zero], -1), bary)
    bary = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None],
                     jnp.stack([zero, zero, one], -1), bary)
    bary = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None],
                     jnp.stack([zero, one, zero], -1), bary)
    bary = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None],
                     jnp.stack([one, zero, zero], -1), bary)

    bary = jnp.clip(bary, 0, 1)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), eps)
    return bary


def _onehot_pick(oh, vals):
    """Exact one-hot row selection: oh [R,S,K] bool (exactly one true per
    [r,s]), vals [R,K,D] -> [R,S,D].

    Equivalent to vals[r, k*, :] with k* the true index, but lowered as a
    fused compare/select/reduce instead of a scattered gather — on TPU the
    per-sample take_along_axis/gather runs ~µs/row while this streams at
    VPU rate.  Summing exactly one nonzero f32 term is bit-exact (x + 0 == x
    in IEEE), so results match the gather form exactly.

    With _DMAJOR_SELECT the same reduction is emitted as D separate [R,S]
    channel planes instead of one [R,S,K,D] virtual 4-D reduce — identical
    per-element arithmetic (bit-exact), measured 3.1x faster in isolation at
    plush dims (runlogs/round4f/queue.log)."""
    if _DMAJOR_SELECT:
        return jnp.stack(
            [
                jnp.sum(jnp.where(oh, vals[:, None, :, d], 0), axis=-1)
                for d in range(vals.shape[-1])
            ],
            -1,
        )
    return jnp.sum(jnp.where(oh[..., None], vals[:, None, :, :], 0), axis=2)


def _onehot_pick1(oh, vals):
    """Scalar variant: oh [R,S,K] bool, vals [R,K] (or [R,S,K]) -> [R,S]."""
    if vals.ndim == oh.ndim:
        return jnp.sum(jnp.where(oh, vals, 0), axis=-1)
    return jnp.sum(jnp.where(oh, vals[:, None, :], 0), axis=-1)


def _interval_pick(cum, s, vals):
    """vals[i][clip(count, 0, 2K-1)] with count = sum(cum <= s, -1), as one
    interval-membership where/sum per channel (see ``_INTERVAL_PICK``).

    cum [R,2K] ascending, s [R,S], vals a tuple of [R,2K] tables ->
    tuple of [R,S] picks, bit-exact vs the count + one-hot form.

    Precondition: finite cum and s.  For s = +inf (or NaN anywhere) no
    interval matches and the pick is 0.0, where the count+clip form would
    return vals[clip(count, ...)]; all callers mask such rows downstream,
    so the bit-exactness claim is scoped to finite inputs."""
    ninf = jnp.full_like(cum[:, :1], -jnp.inf)
    lo = jnp.concatenate([ninf, cum[:, :-1]], -1)
    hi = jnp.concatenate([cum[:, :-1], -ninf], -1)
    sx = s[..., None]
    inb = (lo[:, None, :] <= sx) & (sx < hi[:, None, :])
    return tuple(jnp.sum(jnp.where(inb, v[:, None, :], 0.0), -1) for v in vals)


def _force_rowmajor(x):
    """Materialize ``x`` in row-major layout (bit-exact pure data movement).

    A ``[R,C]{0,1}`` (column-major) array reshaped to ``[R*C]{0}`` is a
    PHYSICAL relayout — the linear orders differ — and the reshape back to
    ``[R,C]`` row-major is then a bitcast.  The ``optimization_barrier``
    stops XLA's algebraic simplifier from folding the reshape pair away.
    Used to break the layout chain between the sort/cumsum event-table
    producers (which prefer ray-minor) and the [Rb,S,*] per-sample reduce
    consumers (see ``_EVENT_RELAYOUT``).  If ``x`` is already row-major the
    flatten is itself a bitcast and the whole thing is ~free."""
    if not _EVENT_RELAYOUT:
        return x
    return jax.lax.optimization_barrier(x.reshape(-1)).reshape(x.shape)


def _running_select(events, queries, val_tables):
    """vals[clip(count, 0, E-1)] for each query, by a running select.

    events [R,E] ascending per row; queries [R,Q]; each v in val_tables is
    [R,E].  Returns tuple of [R,Q] with v[r, clip(#(events[r] <= q), 0, E-1)]
    — the one-hot count+pick semantics of the segment walk, computed as a
    fori over the E events that overwrites the accumulator wherever
    events[k] <= q (sortedness makes the last overwrite the count'th entry;
    k = E-1 writes index min(E, E-1) = the upper clip; no event <= q leaves
    the init v[:, 0] = the lower bound).  Exact select, no arithmetic.
    Measured 2.3x the one-hot form at plush dims (micro_select "pick",
    runlogs/round4f/queue.log; docs/PERF.md §2.15)."""
    r, q = queries.shape
    e = events.shape[-1]

    def body(k, accs):
        ev_k = jax.lax.dynamic_slice_in_dim(events, k, 1, 1)         # [R,1]
        sel = ev_k <= queries                                        # [R,Q]
        nxt = jnp.minimum(k + 1, e - 1)
        return tuple(
            jnp.where(sel, jax.lax.dynamic_slice_in_dim(v, nxt, 1, 1), acc)
            for v, acc in zip(val_tables, accs)
        )

    init = tuple(jnp.broadcast_to(v[:, 0:1], (r, q)) for v in val_tables)
    return jax.lax.fori_loop(0, e, body, init)


def _moller_trumbore(o, d, v0, e1, e2, t_max=T_FAR):
    """First-hit over a triangle chunk.  o,d [R,3]; v0/e1/e2 [T,3].
    Returns (t [R,T], u, v) with inf where missed.

    TPU note: written componentwise over [R,T] planes — a [R,T,3] layout
    puts 3 in the minor (lane) dimension and pads 42x in VMEM/HBM."""
    ox, oy, oz = (o[..., c, None] for c in range(3))
    dx, dy, dz = (d[..., c, None] for c in range(3))
    e2x, e2y, e2z = (e2[:, c] for c in range(3))
    e1x, e1y, e1z = (e1[:, c] for c in range(3))
    v0x, v0y, v0z = (v0[:, c] for c in range(3))

    # pvec = d x e2  (outer-product broadcast -> [R,T] per component)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < t_max)
    return jnp.where(ok, t, jnp.inf), u, v


def _sample_channel_quads(quads, uv, dims):
    """Bilinear fetch via ONE quad-packed row gather.  quads [W,H,4] holds
    the 4 corners (c[x,y], c[x,y+1], c[x+1,y], c[x+1,y+1]) at [x,y]."""
    w, h = dims
    x = jnp.clip(uv[..., 0], 0, 1) * (w - 1)
    y = jnp.clip(uv[..., 1], 0, 1) * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    fx = x - x0
    fy = y - y0
    q = quads[x0, y0]                                    # [..., 4]
    c0 = q[..., 0] * (1 - fy) + q[..., 1] * fy
    c1 = q[..., 2] * (1 - fy) + q[..., 3] * fy
    return c0 * (1 - fx) + c1 * fx


def _fetch_channel(ds, i, uv):
    """Bilinear parameter-texture fetch for channel i at uv: the Pallas
    one-hot MXU kernel when the scene's byte tables exist (NERFTEX_PALLAS_TEX,
    kernels/tex_gather.py), the XLA quad row-gather otherwise."""
    if getattr(ds, "tex_tablesT", None) is not None:
        from nerftex_tpu.kernels.tex_gather import sample_channel_quads_pallas

        return sample_channel_quads_pallas(
            ds.tex_tablesT[i], uv, ds.tex_dims[i], b_rows=_PALLAS_TEX_ROWS
        )
    return _sample_channel_quads(ds.tex_quads[i], uv, ds.tex_dims[i])


def _sample_channel(channel, uv, dims):
    """Bilinear fetch on a padded [W,H] channel with true dims (w, h)."""
    w, h = dims
    x = jnp.clip(uv[..., 0], 0, 1) * (w - 1)
    y = jnp.clip(uv[..., 1], 0, 1) * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    fx = x - x0
    fy = y - y0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    return (
        channel[x0, y0] * (1 - fx) * (1 - fy)
        + channel[x0, y1] * (1 - fx) * fy
        + channel[x1, y0] * fx * (1 - fy)
        + channel[x1, y1] * fx * fy
    )


# ---------------------------------------------------------------------------
# The instancer
# ---------------------------------------------------------------------------


class DeviceInstancer:
    def __init__(
        self,
        scene: Scene,
        max_hits: int = 64,
        ray_block: int = 256,
        shadow_samples: int = 32,
        texture_lookup: str = "jacobian",
        max_steps_per_ray: int = 512,
        cull_budget: int = 0,
        tri_cull_budget: int = 0,
        shadow_cull_budget: int = 0,
        shadow_tri_cull_budget: int = 0,
        seed: int = 0,
        deterministic_offset: bool = False,
        pallas_selk: bool = False,
    ):
        self.ds = DeviceScene(scene)
        # Per-scene overlap-resolution kernel choice (see _selk_enabled).
        self.pallas_selk = bool(pallas_selk)
        self.max_hits = max_hits
        self.ray_block = ray_block
        self.shadow_samples = shadow_samples
        self.texture_lookup = texture_lookup
        # Conservative per-block instance culling, as an ALWAYS-EXACT
        # branch (same recipe as the shadow pass below): each ray block
        # computes the set of instances whose bounding sphere intersects
        # its ray fan; if that keep set fits cull_budget, the slab tests
        # and top-K run over only the gathered candidates, otherwise the
        # block falls back to the full instance set.  Nothing is ever
        # dropped — the budget is a speed tier, and overflow_cull remains
        # as an always-zero diagnostic.  0 disables the candidate branch
        # (every instance tested — the reference-exact default).
        self.cull_budget = cull_budget
        # Same exact branch for the mesh triangle soup (the first-hit
        # terminator test): 0 disables.  Branch equivalence is exact for
        # discrete outputs; t_mesh-derived floats can shift at f32-epsilon
        # scale from fma contraction on the gathered candidate shapes
        # (tests/test_device_instancer.py).
        self.tri_cull_budget = tri_cull_budget
        # Conservative per-block culling for the SHADOW pass (occlusion
        # queries toward the light), via an ALWAYS-EXACT 3-way block branch
        # (_occlusion_branched): blocks with no consumed shadow result skip
        # the query outright (always on); blocks whose conservative
        # swept-cone keep sets fit these budgets query only the kept
        # instance/triangle candidates; all other blocks (including
        # degenerate wide light cones) fall back to the full query.  Unlike
        # the primary-ray cull there is no drop/overflow failure mode — an
        # undersized budget only costs speed.  0 disables the candidate
        # branch (the skip branch still applies when shadows are cast).
        self.shadow_cull_budget = shadow_cull_budget
        self.shadow_tri_cull_budget = shadow_tri_cull_budget
        # Compact-path cap on marching steps per ray: shrinks every [R,S]
        # buffer (dists, compositing scatter) to min(n_samples, this).
        # Rays needing more steps drop their deepest samples (counted in
        # overflow).  The dense path keeps the full n_samples grid
        # (reference-exact).
        self.max_steps_per_ray = max_steps_per_ray
        self.seed = seed
        # Debug/parity knob (SURVEY §7 risks: "make those optionally
        # deterministic"): fix the per-ray stratified marching offset at the
        # segment midpoint (0.5 * step) instead of drawing it from the key,
        # so renders are RNG-free and chunk-grouping independent — used by
        # the reference-compositing cross-check (scripts/xcheck/).
        self.deterministic_offset = deterministic_offset
        self._call_counter = 0
        self._jit_cache = {}
        self._packed_cache = {}

    def _packed_inst_table(self, use_jac: bool):
        """All per-instance columns the per-sample stage needs, concatenated
        into ONE [N, D] table (inv_rot 9, inv_trans 3, [dir_inv 9],
        [anchor_uv 2, uv_jacobian 6, origins 3]) so the hit-level lookup is
        a single wide-row gather: XLA's TPU gather pays per ROW, not per
        byte — one packed gather measured 3.6x faster than the six
        piecewise ones at plush shapes (docs/PERF.md §2.9).

        Built with numpy and cached as a host array: the first call happens
        inside a traced branch, so a jnp-built cache entry would leak a
        tracer across traces (the constant is lifted per-trace instead)."""
        key = bool(use_jac)
        if key not in self._packed_cache:
            ds = self.ds
            n = ds.n_instances
            cols = [np.asarray(ds.inv_rot).reshape(n, 9), np.asarray(ds.inv_trans)]
            if ds.uniform_scale is None:
                cols.append(np.asarray(ds.dir_inv).reshape(n, 9))
            if use_jac:
                cols += [
                    np.asarray(ds.anchor_uv),
                    np.asarray(ds.uv_jacobian).reshape(n, 6),
                    np.asarray(ds.origins),
                ]
            self._packed_cache[key] = np.concatenate(cols, -1).astype(np.float32)
        return self._packed_cache[key]

    def _gather_inst_cols(self, idx, use_jac):
        """[*idx.shape, D] per-instance columns for instance indices `idx`
        in _packed_inst_table's layout — one wide-row gather from the packed
        table (default), or the piecewise per-column gathers it replaced
        (NERFTEX_PACKED_GATHER=0, kept for A/B provenance)."""
        if _PACKED_GATHER:
            return jnp.asarray(self._packed_inst_table(use_jac))[idx]
        ds = self.ds
        sh = idx.shape
        cols = [ds.inv_rot[idx].reshape(*sh, 9), ds.inv_trans[idx]]
        if ds.uniform_scale is None:
            cols.append(ds.dir_inv[idx].reshape(*sh, 9))
        if use_jac:
            cols += [
                ds.anchor_uv[idx],
                ds.uv_jacobian[idx].reshape(*sh, 6),
                ds.origins[idx],
            ]
        return jnp.concatenate(cols, -1)

    # -- public API (instancer.pyx:34-54 semantics) ---------------------

    def n_instances(self) -> int:
        return self.ds.n_instances

    def get_model_input(self, rays_o, rays_d, parameters, n_samples, step_size, key=None):
        """rays_o/d [R,3] (d normalized), parameters [R,P] -> dict of device
        arrays: rays_d [R,S,3], pts [R,S,3], t [R,S], dists [R,S],
        color_last [R,1,3], alpha_last [R,1], alpha_weight [R,S],
        instance_id [R,S], hit [R] bool, parameters [R,S,P],
        overflow (scalar diagnostic count)."""
        if key is None:
            key = jax.random.fold_in(jax.random.key(self.seed), self._call_counter)
            self._call_counter += 1

        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)
        parameters = jnp.asarray(parameters, jnp.float32)
        r = rays_o.shape[0]
        p = parameters.shape[1]

        block = min(self.ray_block, r)
        n_pad = -(-r // block) * block
        if n_pad > r:
            pad = n_pad - r
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), jnp.float32)])
            rays_d = jnp.concatenate([rays_d, jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (pad, 1))])
            parameters = jnp.concatenate([parameters, jnp.zeros((pad, p), jnp.float32)])

        fn = self._fn(block, int(n_samples), float(step_size), p)
        out = fn(rays_o, rays_d, parameters, key)
        if n_pad > r:
            out = {k: (v[:r] if not k.startswith("overflow") else v) for k, v in out.items()}
        return out

    def _fn(self, block, n_samples, step_size, n_params):
        cache_key = (block, n_samples, step_size, n_params)
        if cache_key not in self._jit_cache:

            @jax.jit
            def fn(rays_o, rays_d, parameters, key):
                n_blocks = rays_o.shape[0] // block

                def run_block(args):
                    o, d, prm, idx = args
                    block_key = jax.random.fold_in(key, idx)
                    return self._block(o, d, prm, n_samples, step_size, block_key)

                outs = jax.lax.map(
                    run_block,
                    (
                        rays_o.reshape(n_blocks, block, 3),
                        rays_d.reshape(n_blocks, block, 3),
                        parameters.reshape(n_blocks, block, -1),
                        jnp.arange(n_blocks),
                    ),
                )
                flat = {
                    k: (jnp.sum(v) if k.startswith("overflow")
                        else v.reshape((n_blocks * block,) + v.shape[2:]))
                    for k, v in outs.items()
                }
                return flat

            self._jit_cache[cache_key] = fn
        return self._jit_cache[cache_key]

    # -- compact public API (used by the renderers) -----------------------

    def get_model_input_compact(
        self, rays_o, rays_d, parameters, n_samples, step_size, budget_per_ray, key=None
    ):
        """Compacted variant: per-ray quantities stay dense, but per-sample
        work (transforms, overlap resolution, textures, lighting) runs only
        on the ~n_steps valid samples, packed sample-major into a fixed
        budget of budget_per_ray * R points.  This is the production path —
        mean occupancy is a small fraction of the n_samples cap (the cap is
        the reference's buffer size, instancer.pyx:40), so dense per-sample
        evaluation wastes most of the chip.

        Returns dict with compacted [B]-shaped sample arrays (pts, rays_d,
        parameters, t, dists_c, alpha_weight, instance_id, taken, ray_idx,
        i_idx) plus dense per-ray arrays (dists [R,S], color_last,
        alpha_last, hit, overflow)."""
        if key is None:
            key = jax.random.fold_in(jax.random.key(self.seed), self._call_counter)
            self._call_counter += 1

        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)
        parameters = jnp.asarray(parameters, jnp.float32)
        r = rays_o.shape[0]
        p = parameters.shape[1]

        block = min(self.ray_block, r)
        n_pad = -(-r // block) * block
        if n_pad > r:
            pad = n_pad - r
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), jnp.float32)])
            rays_d = jnp.concatenate([rays_d, jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (pad, 1))])
            parameters = jnp.concatenate([parameters, jnp.zeros((pad, p), jnp.float32)])

        _check_compact_capacity(n_pad, int(budget_per_ray), p)
        fn = self._fn_compact(block, int(n_samples), float(step_size), p, int(budget_per_ray))
        out = fn(rays_o, rays_d, parameters, key)
        if n_pad > r:
            per_ray_keys = ("dists", "color_last", "alpha_last", "hit")
            out = dict(out)
            for k in per_ray_keys:
                out[k] = out[k][:r]
            # Compacted entries from padded rays have ray_idx >= r; mark them
            # not-taken so consumers ignore them.
            out["taken"] = out["taken"] & (out["ray_idx"] < r)
        return out

    def _fn_compact(self, block, n_samples, step_size, n_params, budget_per_ray):
        cache_key = ("compact", block, n_samples, step_size, n_params, budget_per_ray)
        if cache_key not in self._jit_cache:

            @jax.jit
            def fn(rays_o, rays_d, parameters, key):
                n_blocks = rays_o.shape[0] // block

                def run_block(args):
                    o, d, prm, idx = args
                    block_key = jax.random.fold_in(key, idx)
                    return self._block_compact(
                        o, d, prm, n_samples, step_size, budget_per_ray, block_key
                    )

                outs = jax.lax.map(
                    run_block,
                    (
                        rays_o.reshape(n_blocks, block, 3),
                        rays_d.reshape(n_blocks, block, 3),
                        parameters.reshape(n_blocks, block, -1),
                        jnp.arange(n_blocks),
                    ),
                )
                flat = {}
                for k, v in outs.items():
                    if k.startswith("overflow"):
                        flat[k] = jnp.sum(v)
                    elif k == "ray_idx":
                        # local block ray indices -> global
                        offs = (jnp.arange(n_blocks) * block)[:, None]
                        flat[k] = (v + offs).reshape(-1)
                    else:
                        flat[k] = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])
                # Dense [R,S] spacing table from the per-ray scalars, built
                # after the lax.map so it is one fused elementwise op feeding
                # the compositor instead of a per-block stacking copy.
                S_eff = min(n_samples, self.max_steps_per_ray)
                flat["dists"] = self._dists_grid(
                    flat.pop("n_steps"), flat.pop("total"), flat.pop("tiny"),
                    S_eff, step_size,
                )
                return flat

            self._jit_cache[cache_key] = fn
        return self._jit_cache[cache_key]

    def _block_compact(self, rays_o, rays_d, parameters, S, step, budget_per_ray, key):
        ds = self.ds
        Rb = rays_o.shape[0]
        B = budget_per_ray * Rb
        S = min(S, self.max_steps_per_ray)
        k_ray, k_sample = jax.random.split(key)

        ray = self._per_ray(rays_o, rays_d, parameters, S, step, k_ray)

        # Sample-major compaction: flat order index m = i * Rb + r, so
        # truncation under overflow drops the deepest samples uniformly.
        mask_sm = (jnp.arange(S)[:, None] < ray["n_steps"][None, :]).reshape(-1)
        m_idx = jnp.nonzero(mask_sm, size=B, fill_value=0)[0]
        taken = jnp.arange(B) < jnp.sum(mask_sm)
        ray_idx = (m_idx % Rb).astype(jnp.int32)
        i_idx = (m_idx // Rb).astype(jnp.int32)
        overflow_steps = ray["overflow_steps"] + jnp.maximum(jnp.sum(mask_sm) - B, 0)


        sample = self._per_sample(
            ray, rays_o, rays_d, parameters, ray_idx, i_idx, step, k_sample
        )

        # Per-sample spacing from gathered per-ray scalars (same expressions
        # as _dists_grid) — replaces a 2-D gather from the retired [Rb,S]
        # dists table.
        ns_c = ray["n_steps"][ray_idx]
        tot_c = ray["total"][ray_idx]
        tiny_c = ray["tiny"][ray_idx]
        dists_c = jnp.where(i_idx == ns_c - 1, step + tot_c - ns_c * step,
                            jnp.float32(step))
        dists_c = jnp.where(tiny_c, jnp.where(i_idx == 0, tot_c, 0.0), dists_c)
        dists_c = jnp.where(i_idx < ns_c, dists_c, 0.0)

        return {
            "pts": sample["pts"],
            "rays_d": sample["dirs"],
            "parameters": sample["parameters"],
            "t": sample["t"],
            "dists_c": jnp.where(taken, dists_c, 0.0),
            "alpha_weight": sample["weight"],
            "instance_id": sample["instance_id"],
            "taken": taken,
            "ray_idx": ray_idx,
            "i_idx": i_idx,
            # The dense [Rb,S] dists table is reconstructed OUTSIDE the
            # blocked lax.map (_fn_compact) from these three scalars, so it
            # is never stacked block-by-block.
            "n_steps": ray["n_steps"],
            "total": ray["total"],
            "tiny": ray["tiny"],
            "color_last": ray["color_last"],
            "alpha_last": ray["alpha_last"],
            "hit": ray["hit"],
            "overflow_hits": ray["overflow_hits"],
            "overflow_steps": overflow_steps,
            "overflow_cull": ray["overflow_cull"],
        }

    # -- occupancy-sorted bucketed grid render -----------------------------

    def render_grid_sorted(
        self, rays_o, rays_d, parameters, n_samples, step_size, key, shade_block,
        extra=(), empty_block=None,
    ):
        """Occupancy-sorted bucketed render: the whole hot path in one traced
        program, with per-sample work proportional to actual occupancy.

        The reference walks every ray serially and stops at its own last
        sample (instancer.cpp:772-1014); the dense grid path (the TPU
        re-design) instead pays the worst-case grid for every ray.  This path
        recovers the reference's work-efficiency without dynamic shapes:

          1. per-ray stage for all rays (blocked lax.map; hit intervals,
             n_steps, terminator — cheap, no per-sample work);
          2. one argsort of the rays by descending n_steps: ray blocks become
             occupancy-homogeneous (on typical frames most blocks are empty —
             the material covers a fraction of the image);
          3. lax.map over sorted blocks with lax.switch over step-capacity
             buckets {~8, cap/4, cap/2, 3cap/4, cap}: each block runs the
             per-sample stage + shading at the smallest capacity covering its
             max n_steps.  Empty blocks cost the ~8-step stub only;
          4. results are un-permuted to the original ray order.

        shade_block(inst_block, extra_block, key) -> pytree of [Rb, ...]
        leaves (typically (color [Rb,3], alpha [Rb])): the caller's per-block
        shading (MLP + compositing), traced once per bucket.

        extra: tuple of [R, ...] per-ray arrays to permute/block and hand to
        shade_block (e.g. cone_scale).

        empty_block(ray_tables_block, extra_block, key) -> same pytree
        structure as shade_block, for blocks whose every ray has zero
        marching steps (typically the terminator-only composite): those
        blocks then skip the per-sample stage and the MLP entirely.

        Sample-selection RNG note: the u_sel stream is drawn per *sorted*
        block, so 'random'/'nearest_blend' overlap picks differ from the
        dense path by stream (same distribution); 'nearest' is deterministic
        and bit-exact vs the dense path.

        Returns (shade_out_tree [R,...], aux) with aux = {hit [R],
        overflow_hits, overflow_steps}.
        """
        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)
        parameters = jnp.asarray(parameters, jnp.float32)
        r = rays_o.shape[0]
        p = parameters.shape[1]
        step = float(step_size)
        cap = min(int(n_samples), self.max_steps_per_ray)

        block = min(self.ray_block, r)
        n_pad = -(-r // block) * block
        if n_pad > r:
            pad = n_pad - r
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), jnp.float32)])
            rays_d = jnp.concatenate(
                [rays_d, jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (pad, 1))]
            )
            parameters = jnp.concatenate([parameters, jnp.zeros((pad, p), jnp.float32)])
            extra = tuple(
                jnp.concatenate([e, jnp.zeros((pad,) + e.shape[1:], e.dtype)])
                for e in extra
            )
        n_blocks = n_pad // block
        # Per-ray jitter reproduces the dense path's exact stream
        # (fold_in(key, block_idx) -> split()[0], see _fn/_block), so
        # deterministic overlap methods render bit-identically to the dense
        # grid; the sorted-block per-sample stream uses a disjoint fold.
        k_sorted = jax.random.fold_in(key, 0x7FFFFFFF)

        # 1. per-ray tables for all rays (original block grouping keeps the
        # stratified t_offset stream identical to the dense path).
        def per_ray_block(args):
            o, d, prm, idx = args
            bk = jax.random.split(jax.random.fold_in(key, idx))[0]
            return self._per_ray(o, d, prm, cap, step, bk)

        tables = jax.lax.map(
            per_ray_block,
            (
                rays_o.reshape(n_blocks, block, 3),
                rays_d.reshape(n_blocks, block, 3),
                parameters.reshape(n_blocks, block, -1),
                jnp.arange(n_blocks),
            ),
        )
        overflow_hits = jnp.sum(tables.pop("overflow_hits"))
        overflow_steps = jnp.sum(tables.pop("overflow_steps"))
        overflow_cull = jnp.sum(tables.pop("overflow_cull"))
        tables = {
            k: (None if v is None else v.reshape((n_pad,) + v.shape[2:]))
            for k, v in tables.items()
        }
        hit = tables["hit"]
        n_steps = tables["n_steps"]

        # 2. occupancy sort (descending; stable so equal-step rays keep
        # their relative order).
        order = jnp.argsort(-n_steps, stable=True)
        inv_order = jnp.argsort(order, stable=True)

        # Every per-ray array rides the SAME row permute, so pack them all
        # into one gather per dtype group (docs/PERF.md §2.13) instead of
        # one gather per table.
        t_keys = [k for k, v in tables.items() if v is not None]
        row_leaves = [tables[k] for k in t_keys]
        row_leaves += [rays_o, rays_d, parameters, *extra]
        if _PACKED_PERMUTE:
            permuted = _permute_rows_packed(order, row_leaves)
        else:
            permuted = [v[order] for v in row_leaves]
        tables_s = {k: None for k in tables}
        tables_s.update(zip(t_keys, permuted))
        rays_o_s, rays_d_s, parameters_s = permuted[len(t_keys):len(t_keys) + 3]
        extra_s = tuple(permuted[len(t_keys) + 3:])

        # 3. bucket capacities: ~eighths of the cap plus a stub for empty
        # blocks; each sorted block takes the smallest bucket covering its
        # max n_steps (= its first ray's, since sorted).  Eighths beat
        # quarters by ~3% on the carpet bench (mean occupancy sits far below
        # cap, so finer low buckets cut shade-loop padding) at the price of
        # four more traced branches per compile.
        buckets = sorted(
            {min(cap, 8), *(max(1, (cap * q) // 8) for q in range(1, 9)), cap}
        )
        bucket_arr = jnp.asarray(buckets, jnp.int32)
        # tables_s["n_steps"] IS n_steps[order] — reuse it rather than
        # issuing another (narrow) row gather.
        block_max = tables_s["n_steps"][::block][:n_blocks]
        s_idx = jnp.searchsorted(bucket_arr, block_max, side="left").astype(jnp.int32)

        # Hit-capacity buckets: the same trick along the K axis.  All
        # K-width per-ray tables hold their finite entries as a PREFIX
        # (top-K sort ascending, inf-padded), so a block whose max per-ray
        # hit count fits K_b can slice every such table to [.., K_b] /
        # [.., 2*K_b] bit-exactly — and the whole [Rb, S, K] per-sample
        # overlap machinery (event counting, one-hot picks, active tests)
        # then scales with actual hits instead of max_hits.  Only worth the
        # 3x branch multiplication at large K: measured +6.2% plush (K=128)
        # and +1.4% grass (K=96), but -6% carpet (K=48, the [Rb,S,48] ops
        # are too cheap to beat the extra switch overhead) — so small-K
        # scenes keep a single hit tier (docs/PERF.md §2.7).
        K = tables["tk0"].shape[-1]
        kb_list = sorted({min(K, 8), max(1, K // 4), K}) if K >= 64 else [K]
        kb_arr = jnp.asarray(kb_list, jnp.int32)
        n_hits = jnp.sum(tables_s["kvalid"], -1).astype(jnp.int32)
        block_max_hits = jnp.max(n_hits.reshape(n_blocks, block), -1)
        k_idx = jnp.searchsorted(kb_arr, block_max_hits, side="left").astype(jnp.int32)

        def to_blocks(v):
            return None if v is None else v.reshape((n_blocks, block) + v.shape[1:])

        tables_b = {k: to_blocks(v) for k, v in tables_s.items()}

        _K_KEYS = ("tk0", "tk1", "inst_idx", "kvalid", "sel_a", "sel_b")
        _2K_KEYS = ("cum_incl", "arc_corr")

        def slice_hits(ray, K_b):
            if K_b == K:
                return ray
            ray = dict(ray)
            for key in _K_KEYS:
                if ray.get(key) is not None:
                    ray[key] = ray[key][:, :K_b]
            for key in _2K_KEYS:
                ray[key] = ray[key][:, : 2 * K_b]
            return ray

        def make_branch(S_b, K_b):
            def branch(op):
                ray, o, d, prm, ext, bkey = op
                ray = slice_hits(ray, K_b)
                k_sample, k_shade = jax.random.split(bkey)
                sample = self._per_sample_grid(ray, o, d, prm, S_b, step, k_sample)
                inst = self._assemble_grid(ray, sample, d, prm, S_b, step)
                return shade_block(inst, ext, k_shade)

            return branch

        branches = []
        base = 0
        if empty_block is not None:
            def _empty(op):
                ray, o, d, prm, ext, bkey = op
                return empty_block(ray, ext, bkey)

            branches.append(_empty)
            base = 1
        branches += [make_branch(s, kb) for s in buckets for kb in kb_list]

        bucket_idx = base + s_idx * len(kb_list) + k_idx
        if empty_block is not None:
            bucket_idx = jnp.where(block_max == 0, 0, bucket_idx)

        def run_block(args):
            ray, o, d, prm, ext, b_idx, idx = args
            bkey = jax.random.fold_in(k_sorted, idx)
            return jax.lax.switch(b_idx, branches, (ray, o, d, prm, ext, bkey))

        outs = jax.lax.map(
            run_block,
            (
                tables_b,
                rays_o_s.reshape(n_blocks, block, 3),
                rays_d_s.reshape(n_blocks, block, 3),
                parameters_s.reshape(n_blocks, block, -1),
                tuple(to_blocks(e) for e in extra_s),
                bucket_idx,
                jnp.arange(n_blocks),
            ),
        )

        # 4. un-permute to original ray order, drop padding (same packed
        # single-gather trick as the forward permute — color/alpha are 3- and
        # 1-wide, exactly the shapes that pay full lane-tile padding).
        flat_outs, outs_def = jax.tree.flatten(outs)
        flat_outs = [v.reshape((n_pad,) + v.shape[2:]) for v in flat_outs]
        if _PACKED_PERMUTE:
            flat_outs = _permute_rows_packed(inv_order, flat_outs)
        else:
            flat_outs = [v[inv_order] for v in flat_outs]
        outs = jax.tree.unflatten(outs_def, [v[:r] for v in flat_outs])
        aux = {
            "hit": hit[:r],
            "overflow_hits": overflow_hits,
            "overflow_steps": overflow_steps,
            "overflow_cull": overflow_cull,
        }
        return outs, aux

    # -- one ray block (dense grid path) ----------------------------------

    def _block(self, rays_o, rays_d, parameters, S, step, key):
        """Dense [Rb, S] grid: per-ray quantities broadcast instead of being
        gathered per sample — no compaction machinery at all.  With
        max_steps_per_ray >= n_samples this is the reference-exact layout;
        with a smaller cap it trades tail samples (counted in overflow) for
        proportionally smaller buffers."""
        ds = self.ds
        Rb = rays_o.shape[0]
        P = parameters.shape[-1]
        S = min(S, self.max_steps_per_ray)
        k_ray, k_sample = jax.random.split(key)

        ray = self._per_ray(rays_o, rays_d, parameters, S, step, k_ray)

        sample = self._per_sample_grid(
            ray, rays_o, rays_d, parameters, S, step, k_sample
        )

        return {
            **self._assemble_grid(ray, sample, rays_d, parameters, S, step),
            "overflow_hits": ray["overflow_hits"],
            "overflow_steps": ray["overflow_steps"],
            "overflow_cull": ray["overflow_cull"],
        }

    @staticmethod
    def _dists_grid(n_steps, total, tiny, S, step):
        """Sample-spacing table [Rb, S] from per-ray scalars — the exact
        expressions the per-ray stage used to materialize (uniform `step`
        spacing, a shortened last interval `step + total - n_steps*step`,
        and the tiny-interval single sample).  Recomputed at use sites so
        _per_ray's tables stay O(1) per ray (see note in _per_ray §5)."""
        i_grid = jnp.arange(S)[None, :]
        sample_valid = i_grid < n_steps[:, None]
        dists = jnp.where(
            i_grid == n_steps[:, None] - 1,
            step + total[:, None] - n_steps[:, None] * step,
            jnp.full((1, S), jnp.float32(step)),
        )
        dists = jnp.where(tiny[:, None], jnp.where(i_grid == 0, total[:, None], 0.0), dists)
        return jnp.where(sample_valid, dists, 0.0)

    def _assemble_grid(self, ray, sample, rays_d, parameters, S, step):
        """Mask the raw per-sample stage outputs into the dense [Rb, S] model
        input dict (invalid slots get benign values).  S may be any prefix of
        the grid the per-ray stage was computed with: every ray in the block
        must satisfy n_steps <= S."""
        Rb = rays_d.shape[0]
        P = parameters.shape[-1]
        sample_valid = jnp.arange(S)[None, :] < ray["n_steps"][:, None]
        emit = sample_valid[..., None]
        world_dirs = jnp.broadcast_to(rays_d[:, None, :], (Rb, S, 3))

        return {
            "rays_d": jnp.where(emit, sample["dirs"], world_dirs),
            "pts": jnp.where(emit, sample["pts"], 0.0),
            "t": jnp.where(sample_valid, sample["t"], 0.0),
            "dists": self._dists_grid(ray["n_steps"], ray["total"], ray["tiny"], S, step),
            "color_last": ray["color_last"],
            "alpha_last": ray["alpha_last"],
            "alpha_weight": jnp.where(sample_valid, sample["weight"], 1.0),
            "instance_id": jnp.where(sample_valid, sample["instance_id"], 0).astype(jnp.int32),
            "hit": ray["hit"],
            "parameters": jnp.where(
                emit, sample["parameters"], jnp.broadcast_to(parameters[:, None, :], (Rb, S, P))
            ),
        }

    # -- per-sample stage, dense grid form ([Rb, S]; broadcasts, no gathers
    # of per-ray rows) ----------------------------------------------------

    def _per_sample_grid(self, ray, rays_o, rays_d, parameters, S, step, key):
        ds = self.ds
        Rb = rays_o.shape[0]
        K = ray["tk0"].shape[-1]
        P = parameters.shape[-1]

        if _EVENT_RELAYOUT:
            # Break the ray-minor layout chain from the sort/cumsum
            # producers before the [Rb,S,*] reduces fan out over these.
            ray = dict(ray)
            for k in ("cum_incl", "arc_corr", "tk0", "tk1", "kvalid",
                      "sel_a", "sel_b"):
                if ray.get(k) is not None:
                    ray[k] = _force_rowmajor(ray[k])

        i_grid = jnp.arange(S, dtype=jnp.float32)[None, :]
        s_arc = i_grid * step + ray["t_offset"][:, None]             # [Rb,S]

        if _RUNSEL_WALK:
            t_mu = s_arc + _running_select(
                ray["cum_incl"], s_arc, (ray["arc_corr"],)
            )[0]
        elif _INTERVAL_PICK:
            t_mu = s_arc + _interval_pick(
                ray["cum_incl"], s_arc, (ray["arc_corr"],)
            )[0]
        else:
            j = jnp.sum(ray["cum_incl"][:, None, :] <= s_arc[..., None], axis=-1)
            j = jnp.clip(j, 0, 2 * K - 1)
            oh_j = j[..., None] == jnp.arange(2 * K)[None, None, :]
            t_mu = s_arc + _onehot_pick1(oh_j, ray["arc_corr"])
        t_pt = mean_distance(t_mu, step) if ds.use_mean_distance else t_mu

        pts_w = rays_o[:, None, :] + rays_d[:, None, :] * t_pt[..., None]  # [Rb,S,3]

        # overlap resolution -------------------------------------------
        u_sel = jax.random.uniform(key, (Rb, S))
        method = ds.instance_sampling_method
        if method not in ("random", "nearest", "nearest_blend"):
            raise ValueError(f"unknown instance_sampling_method {method}")
        if _selk_enabled(self.pallas_selk):
            from nerftex_tpu.kernels.selk_resolve import selk_resolve

            sel_k, p_sel, n_active = selk_resolve(
                ray["tk0"], ray["tk1"], ray["kvalid"],
                ray.get("sel_a"), ray.get("sel_b"), t_pt, u_sel,
                method=method,
                blend_range=float(ds.nearest_blend_range),
            )
            if method == "random":
                weight = n_active.astype(jnp.float32)
            elif method == "nearest":
                weight = jnp.ones((Rb, S), jnp.float32)
            else:
                weight = 1.0 / jnp.maximum(p_sel, 1e-20)
            weight = jnp.where(n_active == 1, 1.0, weight)
            oh = sel_k[..., None] == jnp.arange(K)[None, None, :]    # [Rb,S,K]
            return self._per_sample_grid_tail(
                ray, rays_o, rays_d, parameters, oh, weight,
                s_arc, t_mu, pts_w,
            )

        tk0 = ray["tk0"][:, None, :]                                 # [Rb,1,K]
        tk1 = ray["tk1"][:, None, :]
        kvalid = ray["kvalid"][:, None, :]
        active = kvalid & (tk0 <= t_pt[..., None]) & (t_pt[..., None] < tk1)
        n_active = jnp.sum(active, -1)
        iv_dist = jnp.maximum(tk0 - t_pt[..., None], t_pt[..., None] - tk1)
        iv_dist = jnp.where(kvalid, jnp.maximum(iv_dist, 0.0), jnp.inf)
        fallback_k = jnp.argmin(iv_dist, -1)
        active = jnp.where(
            (n_active == 0)[..., None], jax.nn.one_hot(fallback_k, K, dtype=bool), active
        )
        if _SELK_BARRIER:
            active = jax.lax.optimization_barrier(active)
        n_active = jnp.maximum(n_active, 1)

        if method == "random":
            target = jnp.minimum(jnp.floor(u_sel * n_active).astype(jnp.int32), n_active - 1)
            rank = jnp.cumsum(active, -1) - 1
            sel_k = jnp.argmax(active & (rank == target[..., None]), -1)
            weight = n_active.astype(jnp.float32)
        else:
            d2_k = (
                ray["sel_a"][:, None, :]
                + 2.0 * t_pt[..., None] * ray["sel_b"][:, None, :]
                + (t_pt * t_pt)[..., None]
            )
            d2_k = jnp.where(active, jnp.maximum(d2_k, 0.0), jnp.inf)
            if method == "nearest":
                sel_k = jnp.argmin(d2_k, -1)
                weight = jnp.ones((Rb, S), jnp.float32)
            elif method == "nearest_blend":
                dist_k = jnp.where(active, jnp.sqrt(d2_k), jnp.inf)
                if _SELK_BARRIER:
                    dist_k = jax.lax.optimization_barrier(dist_k)
                min_d = jnp.min(dist_k, -1, keepdims=True)
                w = jnp.where(active, jnp.maximum(ds.nearest_blend_range + min_d - dist_k, 0.0), 0.0)
                if _SELK_BARRIER:
                    w = jax.lax.optimization_barrier(w)
                prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
                cum = jnp.cumsum(prob, -1)
                sel_k = jnp.clip(jnp.sum((u_sel[..., None] > cum).astype(jnp.int32), -1), 0, K - 1)
            else:
                raise ValueError(f"unknown instance_sampling_method {method}")

        # One one-hot over the K hit slots drives every per-sample lookup
        # below — hit-level tables ([Rb,K,*], gathered once per ray block)
        # replace the [Rb,S]-granularity scattered gathers, which dominated
        # the profile (~µs/row on TPU).
        oh = sel_k[..., None] == jnp.arange(K)[None, None, :]        # [Rb,S,K]

        if method == "nearest_blend":
            p_sel = _onehot_pick1(oh, prob)
            weight = 1.0 / jnp.maximum(p_sel, 1e-20)
        weight = jnp.where(n_active == 1, 1.0, weight)

        return self._per_sample_grid_tail(
            ray, rays_o, rays_d, parameters, oh, weight, s_arc, t_mu, pts_w
        )

    def _per_sample_grid_tail(self, ray, rays_o, rays_d, parameters, oh,
                              weight, s_arc, t_mu, pts_w):
        """Everything downstream of the overlap pick (shared by the XLA and
        Pallas sel_k paths): instance/table one-hot selects, local
        transforms, texture parameters, lighting."""
        ds = self.ds
        Rb, S, K = oh.shape
        P = parameters.shape[-1]

        inst_h = ray["inst_idx"]                                     # [Rb,K]
        inst = _onehot_pick1(oh, inst_h)                             # [Rb,S]

        use_jac = (
            ds.texture_parameter_idxs
            and self.texture_lookup == "jacobian"
            and ds.anchor_uv is not None
        )
        table = self._gather_inst_cols(inst_h, use_jac)              # [Rb,K,D]
        vals = _onehot_pick(oh, table)                               # [Rb,S,D]

        # local transforms ---------------------------------------------
        rot = vals[..., 0:9].reshape(Rb, S, 3, 3)
        pts_l = jnp.einsum("rsij,rsj->rsi", rot, pts_w) + vals[..., 9:12]
        d0 = 12
        if ds.uniform_scale is not None:
            dinv = rot * ds.uniform_scale
        else:
            dinv = vals[..., d0:d0 + 9].reshape(Rb, S, 3, 3)
            d0 += 9
        dirs_l = jnp.einsum("rsij,rj->rsi", dinv, rays_d)

        # texture parameters -------------------------------------------
        params_out = jnp.broadcast_to(parameters[:, None, :], (Rb, S, P))
        uv = None
        if ds.texture_parameter_idxs:
            if use_jac:
                a_uv = vals[..., d0:d0 + 2]                          # [Rb,S,2]
                jac = vals[..., d0 + 2:d0 + 8].reshape(Rb, S, 2, 3)
                rel = pts_w - vals[..., d0 + 8:d0 + 11]
                uv = jnp.clip(a_uv + jnp.einsum("rsij,rsj->rsi", jac, rel), 0.0, 1.0)
            elif ds.tri_candidates is not None:
                cand = ds.tri_candidates[inst]                       # [Rb,S,Kt]
                a = ds.tri_v0[cand]
                e1 = ds.tri_e1[cand]
                e2 = ds.tri_e2[cand]
                b = a + e1
                c = a + e2
                bary = _closest_point_tri_jnp(pts_w[:, :, None, :], a, b, c)
                cp = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
                d2 = jnp.sum((cp - pts_w[:, :, None, :]) ** 2, -1)
                best = jnp.argmin(d2, -1)
                tri_sel = jnp.take_along_axis(cand, best[..., None], -1)[..., 0]
                bary_sel = jnp.take_along_axis(bary, best[..., None, None], -2)[..., 0, :]
                uv = jnp.einsum("rsk,rskj->rsj", bary_sel, ds.tri_uv[tri_sel])
        if uv is not None:
            for i, slot in enumerate(ds.texture_parameter_idxs):
                val = _fetch_channel(ds, i, uv)
                params_out = params_out.at[..., slot].set(params_out[..., slot] * val)

        # lighting ------------------------------------------------------
        if ray["light_dir_w"] is not None:
            li = ds.light_dir_idx
            light = ray["light_dir_w"][:, None, :]                   # [Rb,1,3]

            if ray["shadow_blocked"] is not None:
                Ssh = ray["shadow_blocked"].shape[-1]
                bucket = jnp.clip(
                    jnp.floor(
                        s_arc / jnp.maximum(ray["total"][:, None], 1e-12) * Ssh
                    ).astype(jnp.int32),
                    0, Ssh - 1,
                )
                oh_b = bucket[..., None] == jnp.arange(Ssh)[None, None, :]
                shadowed = jnp.any(oh_b & ray["shadow_blocked"][:, None, :], -1)
            else:
                shadowed = jnp.zeros((Rb, S), bool)

            if ds.light_strength_idx >= 0:
                vec = light - pts_w
            else:
                vec = jnp.broadcast_to(light, pts_w.shape)
            vec_n = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-12)
            local_l = jnp.einsum("rsij,rsj->rsi", dinv, vec_n)
            down = jnp.broadcast_to(jnp.asarray([0, 0, -1.0], jnp.float32), local_l.shape)
            local_l = jnp.where(shadowed[..., None], down, local_l)
            params_out = jax.lax.dynamic_update_slice_in_dim(params_out, local_l, li, axis=2)

            if ds.light_strength_idx >= 0:
                eps = 1e-6
                d2l = jnp.sum((light - pts_w) ** 2, -1)
                strength = parameters[:, ds.light_strength_idx][:, None] / (4 * jnp.pi * d2l + eps)
                params_out = params_out.at[..., ds.light_strength_idx].set(strength)

        return {
            "pts": pts_l,
            "dirs": dirs_l,
            "parameters": params_out,
            "t": t_mu,
            "weight": weight,
            "instance_id": inst.astype(jnp.int32),
        }

    # -- per-ray stage ----------------------------------------------------

    def _cull_candidates(self, rays_o, rays_d, C):
        """Conservative candidate set for one ray block: instances whose
        bounding sphere can intersect the block's ray bundle.

        A block of consecutive image pixels is a thin FAN, not a circular
        cone (a 2-row strip of a 512-wide image spans ~the full horizontal
        FOV but a fraction of a degree vertically), so the bundle is bounded
        anisotropically: u = mean direction, w = principal in-fan axis
        (power iteration on the direction covariance), n = u x w.  A sphere
        survives if it passes BOTH
          - the out-of-plane slab: |v.n| <= (|v| + reach) sin(s_perp) + reach
          - the in-plane 2D sector test with half-angle s_in
        with reach = instance radius + origin-bundle radius; both forms are
        linear-conservative (projection of the reach sphere is a disk of the
        same radius, and the 2D point-to-sector distance is pd sin(dtheta)).

        Returns (cand [C] ascending global instance ids, cand_valid [C],
        n_dropped scalar).  Conservative: an excluded instance intersects no
        ray of the block, so downstream results are bit-identical to the
        uncull path whenever n_dropped == 0."""
        keep = self._fan_keep(
            self._block_fan(rays_o, rays_d), self.ds.inst_center, self.ds.inst_radius
        )
        return self._keep_to_candidates(keep, C)

    def _cull_tris(self, rays_o, rays_d, C):
        """Triangle-soup variant of _cull_candidates (same conservative fan
        test against per-triangle bounding spheres)."""
        keep = self._fan_keep(
            self._block_fan(rays_o, rays_d), self.ds.tri_center, self.ds.tri_radius
        )
        return self._keep_to_candidates(keep, C)

    @staticmethod
    def _block_fan(rays_o, rays_d):
        """Anisotropic bound of a ray block: origin sphere (o_c, r_o), mean
        direction u, principal in-fan axis w (power iteration), fan normal,
        out-of-plane sine bound and in-plane half-angle."""
        eps = 1e-12
        o_c = rays_o.mean(0)
        r_o = jnp.sqrt(jnp.maximum(jnp.max(jnp.sum((rays_o - o_c) ** 2, -1)), 0.0))
        d_n = rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), eps)
        u = d_n.mean(0)
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)

        resid = d_n - (d_n @ u)[:, None] * u
        cov = resid.T @ resid
        w = cov[:, jnp.argmax(jnp.diagonal(cov))] + 1e-20
        for _ in range(3):
            w = cov @ w
            w = w / jnp.maximum(jnp.linalg.norm(w), eps)
        w = w - (w @ u) * u
        w = w / jnp.maximum(jnp.linalg.norm(w), eps)
        nrm = jnp.cross(u, w)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm), eps)

        sin_perp = jnp.max(jnp.abs(d_n @ nrm)) + 1e-6
        s_in = jnp.max(jnp.arctan2(jnp.abs(d_n @ w), d_n @ u)) + 1e-6
        return o_c, r_o, u, w, nrm, sin_perp, s_in

    @staticmethod
    def _fan_keep(fan, centers, radii):
        """Conservative sphere-vs-fan test (linear forms; see
        _cull_candidates docstring)."""
        o_c, r_o, u, w, nrm, sin_perp, s_in = fan
        v = centers - o_c
        dist = jnp.linalg.norm(v, axis=-1)
        reach = radii + r_o
        inside = dist <= reach
        out_ok = jnp.abs(v @ nrm) <= (dist + reach) * sin_perp + reach
        va = v @ u
        vb = v @ w
        pd = jnp.sqrt(va**2 + vb**2)
        theta = jnp.arctan2(jnp.abs(vb), va)
        dtheta = jnp.minimum(jnp.maximum(theta - s_in, 0.0), jnp.pi / 2)
        in_ok = (theta <= s_in) | (pd * jnp.sin(dtheta) <= reach)
        return inside | (out_ok & in_ok)

    @staticmethod
    def _keep_to_candidates(keep, C):
        n = keep.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        prio = jnp.sort(jnp.where(keep, idx, n + idx))[:C]
        cand_valid = prio < n
        cand = jnp.where(cand_valid, prio, 0).astype(jnp.int32)
        n_dropped = jnp.maximum(jnp.sum(keep.astype(jnp.int32)) - C, 0)
        return cand, cand_valid, n_dropped

    def _per_ray(self, rays_o, rays_d, parameters, S, step, key):
        ds = self.ds
        Rb = rays_o.shape[0]
        K = min(self.max_hits, ds.n_instances)
        P = parameters.shape[-1]

        # Primary culls run as EXACT per-block branches (same recipe as the
        # shadow pass, _occlusion_branched): the conservative fan-keep set
        # is computed for the block, and the culled branch — slab tests /
        # Moller-Trumbore + top-K over the <=budget gathered candidates —
        # is taken only when the whole keep set fits, so nothing is ever
        # dropped; otherwise the block falls back to the full set.  The
        # budgets are now pure speed tiers with no overflow failure mode
        # (overflow_cull stays as an always-zero diagnostic for the
        # reporting plumbing).
        cull_overflow = jnp.int32(0)
        C = self.cull_budget
        C = max(C, K) if (C and max(C, K) < ds.n_instances) else 0
        TC = self.tri_cull_budget
        TC = TC if (TC and 0 < TC < ds.n_tris) else 0
        fan = self._block_fan(rays_o, rays_d) if (C or TC) else None

        # 2. mesh first hit (before intervals: t_mesh clamps t1c) --------
        def _mesh_first_hit(v0, e1, e2, ids, valid):
            t_all, u_all, v_all = _moller_trumbore(rays_o, rays_d, v0, e1, e2)
            if valid is not None:
                t_all = jnp.where(valid[None, :], t_all, jnp.inf)
            best_local = jnp.argmin(t_all, -1)
            tri_b = ids[best_local] if ids is not None else best_local
            t_m = jnp.take_along_axis(t_all, best_local[:, None], -1)[:, 0]
            u_b = jnp.take_along_axis(u_all, best_local[:, None], -1)[:, 0]
            v_b = jnp.take_along_axis(v_all, best_local[:, None], -1)[:, 0]
            return t_m, tri_b.astype(jnp.int32), u_b, v_b

        if ds.n_tris > 0:
            def tri_full(_):
                return _mesh_first_hit(ds.tri_v0, ds.tri_e1, ds.tri_e2, None, None)

            if TC:
                keep_t = self._fan_keep(fan, ds.tri_center, ds.tri_radius)

                def tri_culled(_):
                    tcand, tvalid, _ = self._keep_to_candidates(keep_t, TC)
                    return _mesh_first_hit(
                        ds.tri_v0[tcand], ds.tri_e1[tcand], ds.tri_e2[tcand],
                        tcand, tvalid,
                    )

                t_mesh, tri_best, u_best, v_best = jax.lax.cond(
                    jnp.sum(keep_t) <= TC, tri_culled, tri_full, None
                )
            else:
                t_mesh, tri_best, u_best, v_best = tri_full(None)
            mesh_hit = jnp.isfinite(t_mesh)
        else:
            t_mesh = jnp.full((Rb,), jnp.inf)
            tri_best = jnp.zeros((Rb,), jnp.int32)
            u_best = v_best = jnp.zeros((Rb,))
            mesh_hit = jnp.zeros((Rb,), bool)

        # 1+3. instance slab intervals + top-K nearest -------------------
        # Componentwise [Rb,N] planes via MXU matmuls; a [Rb,N,3] layout
        # would lane-pad 42x (see _moller_trumbore note).  Intervals beyond
        # the K nearest are dropped and counted separately from
        # marching-step truncation: they are hit-level (independent of
        # max_steps_per_ray) and usually hidden behind ~full accumulated
        # opacity (measured 120 dB agreement vs max_hits=64 on the carpet
        # bench frame).
        need_coefs = (
            _SELECT_COEFS and _TOPK_SELECT
            and ds.instance_sampling_method != "random"
        )

        def _intervals_topk(inv_rot_n, inv_trans_n, inst_ids, cand_valid, origins_n):
            n_cols = inv_trans_n.shape[0]
            t0 = jnp.full((Rb, n_cols), -jnp.inf)
            t1 = jnp.full((Rb, n_cols), jnp.inf)
            for c in range(3):
                o_lc = rays_o @ inv_rot_n[:, c, :].T + inv_trans_n[:, c]  # [Rb,N|C]
                d_lc = rays_d @ inv_rot_n[:, c, :].T
                inv_dl = 1.0 / jnp.where(jnp.abs(d_lc) < 1e-12, 1e-12, d_lc)
                t_a = (ds.b_0[c] - o_lc) * inv_dl
                t_b = (ds.b_1[c] - o_lc) * inv_dl
                t0 = jnp.maximum(t0, jnp.minimum(t_a, t_b))
                t1 = jnp.minimum(t1, jnp.maximum(t_a, t_b))
            if cand_valid is not None:
                t0 = jnp.where(cand_valid[None, :], t0, jnp.inf)
                t1 = jnp.where(cand_valid[None, :], t1, -jnp.inf)
            box_hit = (t0 < t1) & (t1 > 0) & (t0 < T_FAR)
            t0c = jnp.clip(t0, 0.0, T_FAR)
            t1c = jnp.clip(t1, 0.0, T_FAR)
            t1c = jnp.minimum(t1c, t_mesh[:, None])
            valid_iv = box_hit & (t0c < t1c)
            overflow = jnp.sum(jnp.maximum(jnp.sum(valid_iv, -1) - K, 0))
            score = jnp.where(valid_iv, t0c, jnp.inf)
            # Top-K nearest via one stable multi-operand sort: t1c and the
            # instance index ride along as values, replacing the
            # row-internal take_along_axis gather (measured 85 ms/frame on
            # the carpet bench).  Stable ascending sort with an iota
            # operand matches top_k's lowest-index-first tie order
            # (inst_ids is ascending, so this holds under culling too —
            # the ids are global instance indices).
            if _TOPK_SELECT:
                # XLA's TPU top_k is a partial reduction — far cheaper than
                # bitonic-sorting all n_cols with two value operands riding
                # along when K << n_cols.  -(-x) is a bitwise sign flip, so
                # tk0 is bit-identical to the sorted path; equal scores pick
                # the lowest position first, matching the stable sort's
                # original-order tie rule.  The two companion columns come
                # from one fused one-hot select over positions (never
                # materialized: XLA fuses compare + where + sum into the
                # reduction, the standard gather replacement here).
                neg, sel = jax.lax.top_k(-score, K)                  # [Rb,K]
                tk0 = -neg
                oh = sel[:, :, None] == jnp.arange(n_cols)[None, None, :]
                tk1_k = jnp.sum(jnp.where(oh, t1c[:, None, :], 0.0), -1)
                inst_idx = jnp.sum(
                    jnp.where(oh, inst_ids[None, None, :], 0), -1
                ).astype(jnp.int32)
                kvalid = jnp.isfinite(tk0)
                tk0 = jnp.where(kvalid, tk0, jnp.inf)
                tk1 = jnp.where(kvalid, tk1_k, jnp.inf)
                if need_coefs:
                    # Anchor-distance quadratic coefficients per candidate,
                    # folded through the same one-hot — replaces the
                    # downstream [Rb,K,3] origins gather.  Identical
                    # per-element arithmetic to the gathered form, so
                    # bit-exact (the selected candidate IS inst_idx's).
                    diff_c = rays_o[:, None, :] - origins_n[None, :, :]
                    a_c = jnp.sum(diff_c * diff_c, -1)               # [Rb,C]
                    b_c = jnp.sum(rays_d[:, None, :] * diff_c, -1)
                    sel_a_k = jnp.sum(jnp.where(oh, a_c[:, None, :], 0.0), -1)
                    sel_b_k = jnp.sum(jnp.where(oh, b_c[:, None, :], 0.0), -1)
            else:
                iota = jnp.broadcast_to(inst_ids, score.shape)
                tk0_s, tk1_s, idx_s = jax.lax.sort(
                    (score, t1c, iota), dimension=-1, num_keys=1, is_stable=True
                )
                tk0 = tk0_s[:, :K]
                inst_idx = idx_s[:, :K]
                kvalid = jnp.isfinite(tk0)
                tk0 = jnp.where(kvalid, tk0, jnp.inf)
                tk1 = jnp.where(kvalid, tk1_s[:, :K], jnp.inf)
            hit_box = jnp.any(box_hit & (t1 > 0), -1)
            if not need_coefs:
                sel_a_k = sel_b_k = None
            return tk0, tk1, inst_idx, kvalid, overflow, hit_box, sel_a_k, sel_b_k

        def inst_full(_):
            return _intervals_topk(
                ds.inv_rot, ds.inv_trans,
                jnp.arange(ds.n_instances, dtype=jnp.int32), None, ds.origins,
            )

        if C:
            keep_i = self._fan_keep(fan, ds.inst_center, ds.inst_radius)

            def inst_culled(_):
                cand, cand_valid, _ = self._keep_to_candidates(keep_i, C)
                return _intervals_topk(
                    ds.inv_rot[cand], ds.inv_trans[cand], cand, cand_valid,
                    ds.origins[cand],
                )

            tk0, tk1, inst_idx, kvalid, overflow_hits, hit_box, sel_a, sel_b = jax.lax.cond(
                jnp.sum(keep_i) <= C, inst_culled, inst_full, None
            )
        else:
            tk0, tk1, inst_idx, kvalid, overflow_hits, hit_box, sel_a, sel_b = inst_full(None)

        # Per-ray quadratic coefficients for sample-to-anchor distances:
        # |o + t d - c|^2 = a + 2 t b + t^2 (|d| = 1) — lets the per-sample
        # stage compute nearest/blend distances with pure arithmetic instead
        # of an [M,K,3] origins gather + reduce.  With _SELECT_COEFS the
        # branch already selected them through the top-K one-hot.
        if sel_a is None and ds.instance_sampling_method != "random":
            oc = ds.origins[inst_idx]                                # [Rb,K,3]
            diff = rays_o[:, None, :] - oc
            sel_a = jnp.sum(diff * diff, -1)
            sel_b = jnp.sum(rays_d[:, None, :] * diff, -1)

        # 4. union of intervals via sorted events ------------------------
        times = jnp.concatenate([tk0, tk1], -1)                      # [Rb,2K]
        if _EVENT_CUMSUM:
            # One stable 2-operand sort carrying +-1 event deltas; the
            # active count is their prefix sum — O(K log K) instead of the
            # O(K^2) compare-all reduction.  Within a tie group the prefix
            # count differs from compare-all only at non-final positions,
            # where gap == 0 forces seg_len to 0 either way (starts sort
            # before ends at equal t: concat order + stability), so
            # seg_len — count's only consumer — is bit-identical.
            delta = jnp.concatenate(
                [jnp.ones_like(tk0, dtype=jnp.int32),
                 jnp.full_like(tk1, -1, dtype=jnp.int32)], -1
            )
            times_s, delta_s = jax.lax.sort(
                (times, delta), dimension=-1, num_keys=1, is_stable=True
            )
            finite_t = jnp.isfinite(times_s)
            count = jnp.cumsum(delta_s, -1)
        else:
            times_s = jnp.sort(times, -1)
            finite_t = jnp.isfinite(times_s)
            t_cmp = jnp.where(finite_t, times_s, 0.0)
            starts_le = jnp.sum(tk0[:, None, :] <= t_cmp[:, :, None], axis=-1)
            ends_le = jnp.sum(tk1[:, None, :] <= t_cmp[:, :, None], axis=-1)
            count = jnp.where(finite_t, starts_le - ends_le, 0)
        nxt = jnp.concatenate([times_s[:, 1:], times_s[:, -1:]], -1)
        gap = jnp.where(jnp.isfinite(nxt) & finite_t, nxt - times_s, 0.0)
        seg_len = jnp.where(count > 0, gap, 0.0)
        cum_incl = jnp.cumsum(seg_len, -1)                           # [Rb,2K]
        cum_excl = cum_incl - seg_len
        total = cum_incl[:, -1]
        # Arc -> world-t correction per event gap: t = s + corr[j]
        # (one gather instead of two at sample time).
        arc_corr = jnp.where(finite_t, times_s - cum_excl, 0.0)

        # 5. per-ray sample layout --------------------------------------
        if self.deterministic_offset:
            u_off = jnp.full((Rb,), 0.5)
        else:
            u_off = jax.random.uniform(key, (Rb,))
        necessary = jnp.floor(total / step).astype(jnp.int32)
        overflow_steps = jnp.sum(jnp.maximum(necessary - S, 0))
        n_steps = jnp.minimum(necessary, S)
        tiny = (necessary == 0) & (total > 0)
        n_steps = jnp.where(tiny, 1, n_steps)
        t_offset = jnp.where(tiny, u_off * total, u_off * step)

        # The [Rb,S] dists table is NOT materialized here: it is a pure
        # function of (n_steps, total, tiny) and is recomputed at use sites
        # (_dists_grid) — as the per-ray stage's only O(S) output it
        # dominated the lax.map output stacking + occupancy-permute cost
        # (measured ~0.7 s/frame of copies on the plush bench).

        # 6. lighting / shadow precomputation (per ray) ------------------
        light_dir_w = None
        shadow_blocked = None
        if ds.light_dir_idx >= 0 and P > ds.light_dir_idx + 2:
            light_dir_w = parameters[:, ds.light_dir_idx : ds.light_dir_idx + 3]
            if ds.cast_shadow_rays:
                shadow_blocked = self._shadow_blocked_sparse(
                    rays_o, rays_d, light_dir_w, cum_incl, cum_excl, times_s, total
                )

        # 7. terminator ---------------------------------------------------
        color_last = jnp.zeros((Rb, 1, 3), jnp.float32)
        alpha_last = mesh_hit[:, None].astype(jnp.float32)
        if ds.n_tris > 0 and len(ds.meshes) > 1:
            color_last = self._shade_terminator(
                rays_o, rays_d, t_mesh, tri_best, u_best, v_best, mesh_hit, light_dir_w
            )[:, None, :]

        hit = hit_box | mesh_hit

        return {
            "tk0": tk0, "tk1": tk1, "inst_idx": inst_idx, "kvalid": kvalid,
            "sel_a": sel_a, "sel_b": sel_b,
            # times_s / cum_excl are consumed above (shadow sampling) and
            # deliberately NOT returned: every key here is stacked by the
            # blocked lax.map, permuted by the occupancy sort, and
            # re-blocked — two dead [Rb,2K] tables cost ~1.3 GB of copies
            # per plush frame.
            "cum_incl": cum_incl,
            "arc_corr": arc_corr,
            "total": total, "n_steps": n_steps, "t_offset": t_offset, "tiny": tiny,
            "color_last": color_last, "alpha_last": alpha_last,
            "hit": hit, "overflow_hits": overflow_hits, "overflow_steps": overflow_steps,
            # Candidate instances/triangles dropped by the conservative
            # per-block cull budgets — kept separate from overflow_hits
            # (dropped hit intervals): nonzero here unambiguously means a
            # cull budget is too small, breaking the bit-exactness
            # precondition (see _cull_candidates docstring).
            "overflow_cull": cull_overflow,
            "light_dir_w": light_dir_w, "shadow_blocked": shadow_blocked,
        }

    # -- per-sample stage (flat [M]; M = Rb*S dense, or the compact budget)

    def _per_sample(self, ray, rays_o, rays_d, parameters, ray_idx, i_idx, step, key):
        ds = self.ds
        M = ray_idx.shape[0]
        K = ray["tk0"].shape[-1]
        P = parameters.shape[-1]

        s_arc = i_idx * step + ray["t_offset"][ray_idx]              # [M]

        cum_incl = ray["cum_incl"][ray_idx]                          # [M,2K]
        j = jnp.sum(cum_incl <= s_arc[:, None], axis=-1)
        j = jnp.clip(j, 0, 2 * K - 1)
        # One-hot select, not take_along_axis (row-internal gathers are the
        # TPU anti-pattern; bit-exact replacement).
        oh_j = j[:, None] == jnp.arange(cum_incl.shape[-1])[None, :]
        t_mu = s_arc + jnp.sum(jnp.where(oh_j, ray["arc_corr"][ray_idx], 0.0), -1)
        t_pt = mean_distance(t_mu, step) if ds.use_mean_distance else t_mu

        o_g = rays_o[ray_idx]
        d_g = rays_d[ray_idx]
        pts_w = o_g + d_g * t_pt[:, None]                            # [M,3]

        # overlap resolution -------------------------------------------
        tk0 = ray["tk0"][ray_idx]                                    # [M,K]
        tk1 = ray["tk1"][ray_idx]
        kvalid = ray["kvalid"][ray_idx]
        inst_idx = ray["inst_idx"][ray_idx]

        active = kvalid & (tk0 <= t_pt[:, None]) & (t_pt[:, None] < tk1)
        n_active = jnp.sum(active, -1)
        iv_dist = jnp.maximum(tk0 - t_pt[:, None], t_pt[:, None] - tk1)
        iv_dist = jnp.where(kvalid, jnp.maximum(iv_dist, 0.0), jnp.inf)
        fallback_k = jnp.argmin(iv_dist, -1)
        active = jnp.where(
            (n_active == 0)[:, None], jax.nn.one_hot(fallback_k, K, dtype=bool), active
        )
        if _SELK_BARRIER:
            active = jax.lax.optimization_barrier(active)
        n_active = jnp.maximum(n_active, 1)

        u_sel = jax.random.uniform(key, (M,))
        method = ds.instance_sampling_method
        if method == "random":
            target = jnp.minimum(jnp.floor(u_sel * n_active).astype(jnp.int32), n_active - 1)
            rank = jnp.cumsum(active, -1) - 1
            sel_k = jnp.argmax(active & (rank == target[:, None]), -1)
            weight = n_active.astype(jnp.float32)
        else:
            d2_k = (
                ray["sel_a"][ray_idx]
                + 2.0 * t_pt[:, None] * ray["sel_b"][ray_idx]
                + (t_pt * t_pt)[:, None]
            )
            d2_k = jnp.where(active, jnp.maximum(d2_k, 0.0), jnp.inf)
            if method == "nearest":
                sel_k = jnp.argmin(d2_k, -1)
                weight = jnp.ones((M,), jnp.float32)
            elif method == "nearest_blend":
                dist_k = jnp.where(active, jnp.sqrt(d2_k), jnp.inf)
                if _SELK_BARRIER:
                    dist_k = jax.lax.optimization_barrier(dist_k)
                min_d = jnp.min(dist_k, -1, keepdims=True)
                w = jnp.where(active, jnp.maximum(ds.nearest_blend_range + min_d - dist_k, 0.0), 0.0)
                if _SELK_BARRIER:
                    w = jax.lax.optimization_barrier(w)
                prob = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
                cum = jnp.cumsum(prob, -1)
                sel_k = jnp.clip(jnp.sum((u_sel[:, None] > cum).astype(jnp.int32), -1), 0, K - 1)
                oh_p = sel_k[:, None] == jnp.arange(K)[None, :]
                p_sel = jnp.sum(jnp.where(oh_p, prob, 0.0), -1)
                weight = 1.0 / jnp.maximum(p_sel, 1e-20)
            else:
                raise ValueError(f"unknown instance_sampling_method {method}")
        weight = jnp.where(n_active == 1, 1.0, weight)

        oh_k = sel_k[:, None] == jnp.arange(K)[None, :]
        inst = jnp.sum(jnp.where(oh_k, inst_idx, 0), -1)             # [M]

        # local transforms (one packed per-instance gather, see
        # _packed_inst_table) ------------------------------------------
        use_jac = (
            ds.texture_parameter_idxs
            and self.texture_lookup == "jacobian"
            and ds.anchor_uv is not None
        )
        vals = self._gather_inst_cols(inst, use_jac)                 # [M,D]
        rot = vals[..., 0:9].reshape(-1, 3, 3)
        pts_l = jnp.einsum("mij,mj->mi", rot, pts_w) + vals[..., 9:12]
        d0 = 12
        if ds.uniform_scale is not None:
            dinv = rot * ds.uniform_scale
        else:
            dinv = vals[..., d0:d0 + 9].reshape(-1, 3, 3)
            d0 += 9
        dirs_l = jnp.einsum("mij,mj->mi", dinv, d_g)

        # texture parameters --------------------------------------------
        params_out = parameters[ray_idx]                             # [M,P]
        uv = None
        if ds.texture_parameter_idxs:
            if use_jac:
                a_uv = vals[..., d0:d0 + 2]
                jac = vals[..., d0 + 2:d0 + 8].reshape(-1, 2, 3)
                rel = pts_w - vals[..., d0 + 8:d0 + 11]
                uv = jnp.clip(a_uv + jnp.einsum("mij,mj->mi", jac, rel), 0.0, 1.0)
            elif ds.tri_candidates is not None:
                cand = ds.tri_candidates[inst]                       # [M,Kt]
                a = ds.tri_v0[cand]
                e1 = ds.tri_e1[cand]
                e2 = ds.tri_e2[cand]
                b = a + e1
                c = a + e2
                bary = _closest_point_tri_jnp(pts_w[:, None, :], a, b, c)
                cp = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
                d2 = jnp.sum((cp - pts_w[:, None, :]) ** 2, -1)
                best = jnp.argmin(d2, -1)
                tri_sel = jnp.take_along_axis(cand, best[:, None], -1)[:, 0]
                bary_sel = jnp.take_along_axis(bary, best[:, None, None], -2)[:, 0, :]
                uv = jnp.einsum("mk,mkj->mj", bary_sel, ds.tri_uv[tri_sel])
        if uv is not None:
            for i, slot in enumerate(ds.texture_parameter_idxs):
                val = _fetch_channel(ds, i, uv)
                params_out = params_out.at[:, slot].set(params_out[:, slot] * val)

        # lighting -------------------------------------------------------
        if ray["light_dir_w"] is not None:
            li = ds.light_dir_idx
            light_g = ray["light_dir_w"][ray_idx]                    # [M,3]

            if ray["shadow_blocked"] is not None:
                Ssh = ray["shadow_blocked"].shape[-1]
                bucket = jnp.clip(
                    jnp.floor(s_arc / jnp.maximum(ray["total"][ray_idx], 1e-12) * Ssh).astype(jnp.int32),
                    0, Ssh - 1,
                )
                shadowed = ray["shadow_blocked"][ray_idx, bucket]
            else:
                shadowed = jnp.zeros((M,), bool)

            if ds.light_strength_idx >= 0:
                vec = light_g - pts_w
            else:
                vec = light_g
            vec_n = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-12)
            local_l = jnp.einsum("mij,mj->mi", dinv, vec_n)
            down = jnp.broadcast_to(jnp.asarray([0, 0, -1.0], jnp.float32), local_l.shape)
            local_l = jnp.where(shadowed[:, None], down, local_l)
            params_out = jax.lax.dynamic_update_slice_in_dim(params_out, local_l, li, axis=1)

            if ds.light_strength_idx >= 0:
                eps = 1e-6
                d2l = jnp.sum((light_g - pts_w) ** 2, -1)
                strength = parameters[ray_idx, ds.light_strength_idx] / (4 * jnp.pi * d2l + eps)
                params_out = params_out.at[:, ds.light_strength_idx].set(strength)

        return {
            "pts": pts_l,
            "dirs": dirs_l,
            "parameters": params_out,
            "t": t_mu,
            "weight": weight,
            "instance_id": inst.astype(jnp.int32),
        }

    # -- shadows ---------------------------------------------------------

    @staticmethod
    def _light_cone(light_dir, valid):
        """Cone bound of the valid rows' shadow directions: unit mean axis
        u_l, a conservative tan of the half-angle, and a traced `wide` flag
        (cos below 0.1 ≈ spread past ~84 deg) that disables culling."""
        eps = 1e-12
        l = light_dir.reshape(-1, 3)
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), eps)
        w = valid.reshape(-1).astype(jnp.float32)[:, None]
        u = jnp.sum(l * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)
        cos_min = jnp.min(jnp.where(valid.reshape(-1), l @ u, 1.0))
        wide = cos_min <= 0.1
        cos_safe = jnp.maximum(cos_min, 0.1)
        sin_max = jnp.sqrt(jnp.maximum(1.0 - cos_safe * cos_safe, 0.0))
        return u, sin_max / cos_safe, wide

    @staticmethod
    def _swept_keep(c, r, u_l, tan_a, centers, radii):
        """Conservative sphere-vs-swept-cone test.  The swept volume is
        {p + t*l : |p-c| <= r, l in cone(u_l, alpha), t >= 0}; any point x
        in it satisfies (x-c)@u_l >= -r and |perp(x-c)| <= r + t*sin(alpha)
        with t <= ((x-c)@u_l + r)/cos(alpha).  Inflating both linear forms
        by the occluder radius gives a necessary intersection condition, so
        an excluded occluder cannot block any shadow sample of the block."""
        v = centers - c
        va = v @ u_l
        lat2 = jnp.sum(v * v, -1) - va * va
        reach = radii + r
        slack = reach + jnp.maximum(va + reach, 0.0) * tan_a
        return (va >= -reach) & (lat2 <= slack * slack)

    def _occlusion_branched(self, pts, light_dir_b, pt_valid):
        """`_shadow_query(pts, light_dir_b)` computed through an exact
        3-way block-level branch (lax.switch — one branch executes per
        block at runtime):

          0. no valid point in the block -> skip the query entirely
             (downstream consumers mask these rows, so the result is
             unobservable; blocks outside the material footprint pay ~zero
             instead of the full [.., N]+[.., T] test);
          1. the conservative swept-cone keep sets fit the shadow budgets
             -> query over the gathered candidates only.  Sound: every
             valid point lies in the block's bounding sphere, so an
             occluder outside the swept cone cannot block any of them —
             and the branch is only taken when NOTHING is dropped;
          2. otherwise -> the full occlusion query.

        All three branches are exact, so unlike the primary-ray cull there
        is no budget-overflow failure mode — an undersized budget only
        costs speed.  pts [..., 3]; light_dir_b broadcastable to pts;
        pt_valid broadcastable to pts[..., 0] marking rows whose result is
        consumed."""
        ds = self.ds
        C = self.shadow_cull_budget
        C = C if (C and C < ds.n_instances) else 0
        TC = self.shadow_tri_cull_budget
        TC = TC if (TC and 0 < TC < ds.n_tris) else 0

        shape = pts.shape[:-1]
        fvalid = jnp.broadcast_to(pt_valid, shape).reshape(-1)
        any_valid = jnp.any(fvalid)

        def empty(_):
            return jnp.zeros(shape, bool)

        def full(_):
            return self._shadow_query(pts, light_dir_b)

        if not (C or TC):
            return jax.lax.cond(any_valid, full, empty, None)

        flat_l = jnp.broadcast_to(light_dir_b, pts.shape).reshape(-1, 3)
        c, r = self._point_bound(pts.reshape(-1, 3), fvalid)
        u_l, tan_a, wide = self._light_cone(flat_l, fvalid)
        fits = ~wide
        keep_i = keep_t = None
        if C:
            keep_i = self._swept_keep(c, r, u_l, tan_a, ds.inst_center, ds.inst_radius)
            fits = fits & (jnp.sum(keep_i) <= C)
        if TC:
            keep_t = self._swept_keep(c, r, u_l, tan_a, ds.tri_center, ds.tri_radius)
            fits = fits & (jnp.sum(keep_t) <= TC)

        def culled(_):
            inst_sel = (
                self._keep_to_candidates(keep_i, C)[:2] if keep_i is not None else None
            )
            tri_sel = (
                self._keep_to_candidates(keep_t, TC)[:2] if keep_t is not None else None
            )
            return self._shadow_query(pts, light_dir_b, inst_sel, tri_sel)

        idx = jnp.where(any_valid, jnp.where(fits, 1, 2), 0)
        return jax.lax.switch(idx, [empty, culled, full], None)

    def _shadow_query(self, pts, light_dir, inst_sel=None, tri_sel=None):
        """Batched occlusion query (instancer.cpp:593-602 + filter :544-554).
        pts [..., 3], light_dir [..., 3] -> blocked [...].

        inst_sel/tri_sel: optional (ids, valid) candidate subsets from
        _shadow_cull — the test then runs over the candidates only, with
        invalid (padding) columns forced to not-blocking.

        The local-frame transforms are broadcast multiply-adds, NOT matmuls:
        a matmul is an XLA fusion boundary, so the [rays, Ssh, N] plane
        values would materialize in HBM (3 x 400 MB at plush scale) and the
        face tests would re-stream them — measured ~46% of the grass/plush
        frames (docs/PERF.md §2.4).  In broadcast form the whole box test
        fuses into the any-reduction like the Moller-Trumbore test does,
        and the [.., N] intermediates never leave registers/VMEM."""
        ds = self.ds
        if inst_sel is not None:
            rot = ds.inv_rot[inst_sel[0]]                            # [C,3,3]
            trans = ds.inv_trans[inst_sel[0]]                        # [C,3]
            col_valid = inst_sel[1]
        else:
            rot, trans, col_valid = ds.inv_rot, ds.inv_trans, None
        p = pts[..., None]                                           # [..,3,1]
        l = light_dir[..., None]                                     # [..,3,1]

        def row(c, vec, use_trans):
            return (
                vec[..., 0, :] * rot[:, c, 0]
                + vec[..., 1, :] * rot[:, c, 1]
                + vec[..., 2, :] * rot[:, c, 2]
                + (trans[:, c] if use_trans else 0.0)
            )

        o_lx = row(0, p, True)
        o_ly = row(1, p, True)
        o_lz = row(2, p, True)
        d_lx = row(0, l, False)
        d_ly = row(1, l, False)
        dz = row(2, l, False)

        safe_dz = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)

        def face_block(z_plane, is_top):
            t = (z_plane - o_lz) / safe_dz
            px = o_lx + t * d_lx
            py = o_ly + t * d_ly
            inside = (
                (px >= ds.b_0[0]) & (px <= ds.b_1[0])
                & (py >= ds.b_0[1]) & (py <= ds.b_1[1])
            )
            ok = (t > 0) & (t < T_FAR) & inside & (jnp.abs(dz) > 1e-12)
            if is_top:
                ok = ok & (dz < 0)
            return ok

        face_ok = face_block(ds.b_1[2], True) | face_block(ds.b_0[2], False)
        if col_valid is not None:
            face_ok = face_ok & col_valid
        blocked = jnp.any(face_ok, -1)

        if ds.n_tris > 0:
            if tri_sel is not None:
                v0 = ds.tri_v0[tri_sel[0]]
                e1 = ds.tri_e1[tri_sel[0]]
                e2 = ds.tri_e2[tri_sel[0]]
                tri_valid = tri_sel[1]
            else:
                v0, e1, e2, tri_valid = ds.tri_v0, ds.tri_e1, ds.tri_e2, None
            t_hit, _, _ = _moller_trumbore(pts, light_dir, v0, e1, e2)
            ng = jnp.cross(e1, e2)
            front = jnp.sum(light_dir[..., None, :] * ng, -1) < 0
            tri_ok = jnp.isfinite(t_hit) & front
            if tri_valid is not None:
                tri_ok = tri_ok & tri_valid
            blocked = blocked | jnp.any(tri_ok, -1)

        return blocked

    @staticmethod
    def _point_bound(pts, valid):
        """Bounding sphere (center, radius) of pts[valid]; a zero sphere at
        the masked mean when nothing is valid.  Radius is inflated by a
        relative epsilon so float rounding in the mean/norms cannot shave a
        marginal occluder off the conservative keep set."""
        pts_safe = jnp.where(valid[:, None], pts, 0.0)
        w = valid.astype(jnp.float32)[:, None]
        c = jnp.sum(pts_safe * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
        d2 = jnp.sum((pts_safe - c) ** 2, -1)
        r = jnp.sqrt(jnp.max(jnp.where(valid, d2, 0.0)))
        return c, r * 1.001 + 1e-5

    def _shadow_blocked_sparse(self, rays_o, rays_d, light_dir, cum_incl, cum_excl, times_s, total):
        """Sparse shadow samples along the inside-arc (instancer.cpp:929-951's
        sparse path, uniform over the union instead of per-segment); samples
        look up their bucket by arc position in the per-sample stage.
        Returns blocked [Rb, Ssh], computed through the exact 3-way
        skip/culled/full block branch (_occlusion_branched); rays with no
        hit arc are invalid rows — their (unused, NaN-propagating) shadow
        results are not-blocked on every branch."""
        Ssh = self.shadow_samples
        if _EVENT_RELAYOUT:
            # Same layout break as _per_sample_grid: these arrive straight
            # from the ray-minor sort/cumsum producers in this program.
            cum_incl = _force_rowmajor(cum_incl)
            cum_excl = _force_rowmajor(cum_excl)
            times_s = _force_rowmajor(times_s)
        frac = (jnp.arange(Ssh) + 0.5) / Ssh
        s_sh = frac[None, :] * total[:, None]                        # [Rb,Ssh]
        if _RUNSEL_WALK:
            t_pick, c_pick = _running_select(cum_incl, s_sh, (times_s, cum_excl))
            t_sh = t_pick + (s_sh - c_pick)
        elif _INTERVAL_PICK:
            t_pick, c_pick = _interval_pick(cum_incl, s_sh, (times_s, cum_excl))
            t_sh = t_pick + (s_sh - c_pick)
        else:
            j = jnp.sum(cum_incl[:, None, :] <= s_sh[:, :, None], axis=-1)
            j = jnp.clip(j, 0, times_s.shape[-1] - 1)
            # One-hot select instead of take_along_axis (the row-internal
            # gather cost ~170 ms/frame on the grass bench — same
            # anti-pattern the per-sample stage avoids).
            oh_j = j[..., None] == jnp.arange(times_s.shape[-1])[None, None, :]
            picked = _onehot_pick(oh_j, jnp.stack([times_s, cum_excl], -1))
            t_sh = picked[..., 0] + (s_sh - picked[..., 1])
        pts_sh = rays_o[:, None, :] + rays_d[:, None, :] * t_sh[..., None]
        valid = (total > 0) & jnp.isfinite(times_s[:, 0])
        return self._occlusion_branched(
            pts_sh, light_dir[:, None, :], valid[:, None]
        )                                                            # [Rb,Ssh]

    # -- terminator shading ----------------------------------------------

    def _shade_terminator(self, rays_o, rays_d, t_mesh, tri, u, v, mesh_hit, light_dir):
        """shadeMesh for aux meshes; base mesh renders black
        (instancer.cpp:716-743, 1018-1029)."""
        ds = self.ds
        bary = jnp.stack([1 - u - v, u, v], -1)                      # [Rb,3]
        n = jnp.einsum("rk,rkj->rj", bary, ds.tri_n[tri])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        uv = jnp.einsum("rk,rkj->rj", bary, ds.tri_uv[tri])
        mid = ds.tri_mesh_id[tri]

        if ds.mesh_tex is not None:
            texs = ds.mesh_tex[mid]                                  # [Rb,W,H,3]
            w, h = ds.mesh_tex.shape[1], ds.mesh_tex.shape[2]
            x = jnp.clip(uv[:, 0], 0, 1) * (w - 1)
            y = jnp.clip(uv[:, 1], 0, 1) * (h - 1)
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(x, jnp.int32)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(y, jnp.int32)
            fx = (x - x0)[:, None]
            fy = (y - y0)[:, None]
            r_idx = jnp.arange(texs.shape[0])
            g = lambda xi, yi: texs[r_idx, xi, yi]
            albedo = (
                g(x0, y0) * (1 - fx) * (1 - fy)
                + g(x0, jnp.minimum(y0 + 1, h - 1)) * (1 - fx) * fy
                + g(jnp.minimum(x0 + 1, w - 1), y0) * fx * (1 - fy)
                + g(jnp.minimum(x0 + 1, w - 1), jnp.minimum(y0 + 1, h - 1)) * fx * fy
            )
            albedo = jnp.where(albedo < 0, 0.8, albedo)              # -1 padding = untextured gray
        else:
            albedo = jnp.full((rays_o.shape[0], 3), 0.8)

        hit_pt = rays_o + jnp.where(mesh_hit, t_mesh, 0.0)[:, None] * rays_d
        diffuse = jnp.zeros(rays_o.shape[0])
        is_aux = mid > 0
        if light_dir is not None:
            ld = light_dir / jnp.maximum(jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-12)
            diffuse = jnp.maximum(jnp.sum(n * ld, -1), 0.0)
            if ds.cast_shadow_rays:
                # Only aux-mesh terminator pixels consume the occlusion
                # result (base mesh renders black), so the branched query
                # can skip blocks without them.
                blocked = self._occlusion_branched(
                    hit_pt + n * 1e-6, light_dir, mesh_hit & is_aux
                )
                diffuse = jnp.where(blocked, 0.0, diffuse)

        shade = jnp.minimum(diffuse + 0.2, 1.0)[:, None] * albedo
        color = jnp.where(is_aux[:, None], shade, 0.0)
        return jnp.where(mesh_hit[:, None], color, 0.0)
