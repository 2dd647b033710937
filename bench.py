"""Benchmark: instanced carpet render throughput (one JSON line).

Workload = the north-star render (BASELINE.md): config_carpet_render shapes —
512x512 rays, n_samples cap 1024, step 0.002, 900 patch instances over the
cloth mesh, nearest overlap selection, checkerboard parameter texture,
directional light — rendered fully on-device (instancer + conditioned MLP +
compositing in one traced program per frame).

Render path: the occupancy-sorted bucketed grid (device.render_grid_sorted):
rays are argsorted by marching-step count, and sorted ray blocks run through
a lax.switch over step-capacity buckets, so per-sample + MLP work scales with
actual occupancy (mean 40.6 of 1024 requested samples on this frame; 69.6%
of rays march zero steps).  Bit-level identical to the dense reference-exact
grid (tests/test_sorted_render.py; measured 120 dB on this frame).

Drop accounting (VERDICT r1 item 3): max_hits=48 and step cap 320 cover this
scene exactly — the bench frame renders with ZERO hit-interval and ZERO
sample drops (the r1 configuration max_hits=32/cap=256 dropped 17,849
intervals + 3,727 samples, which measured 68.6 dB PSNR against this frame —
invisible, but no longer traded for speed: the clean config is within 3.5%
of the fastest lossy one).

Inputs are staged on-device before timing: ray generation is not part of the
measured render (and host->device transfers over the axon tunnel are wildly
variable, CLAUDE.md).  bfloat16 MLP activations (inference only): 71-73 dB
agreement with the f32 path on the trained carpet demo renders.

vs_baseline derivation (both sides measured on THIS machine, 2026-08-16):
the reference implementation cannot run its renderer here (Embree is not
installed), so the baseline is the reference's *best-case ceiling*: its
TF-CPU conditioned-MLP forward throughput (86,733 points/s, TF 2.21 + legacy
keras, net_chunk 32768) divided by the measured mean of 128.5 valid samples
per ray over the hit region of this exact scene = 675 rays/s.  This ignores
the reference's serial per-ray Embree walk entirely (instancer.cpp:772),
i.e. it is generous to the reference.  The reference's measured *training*
rate on this CPU is 0.0705 steps/s vs 52.9 steps/s here (750x) — see
scripts/bench_train.py.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_CPU_RAYS_PER_SEC = 675.0

# Committed golden of the timed frame (key(1), bf16 path, float16-quantized).
# The bench fails loudly if the frame drifts below GOLDEN_PSNR_DB against it:
# a regression anywhere in the cull / sort / instancing / compositing chain
# cannot report a fast garbage frame.  Legitimate noise sits far above the
# floor (bf16-vs-f32 agreement is 71-73 dB; f16 quantization of the golden
# caps the comparison near ~70 dB), while wrong frames measure < 30 dB.
GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "golden_bench_frame.npz")
GOLDEN_PSNR_DB = 55.0


def _check_golden(out, write=False):
    color = np.asarray(out["color_pred"], np.float32)[0]
    alpha = np.asarray(out["alpha_pred"], np.float32)[0]
    assert np.isfinite(color).all() and np.isfinite(alpha).all()
    if write:
        np.savez_compressed(
            GOLDEN_PATH, color=color.astype(np.float16), alpha=alpha.astype(np.float16)
        )
        print(f"wrote golden frame to {GOLDEN_PATH}", file=sys.stderr)
        return
    g = np.load(GOLDEN_PATH)
    err = np.concatenate(
        [color - g["color"].astype(np.float32),
         alpha[:, None] - g["alpha"].astype(np.float32)[:, None]], -1
    )
    mse = float(np.mean(err * err))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= GOLDEN_PSNR_DB, (
        f"bench frame diverged from golden: {psnr:.1f} dB < {GOLDEN_PSNR_DB} dB floor"
    )
    print(f"golden check: {psnr:.1f} dB (floor {GOLDEN_PSNR_DB})", file=sys.stderr)


def main():
    import jax

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_render import build, ray_data

    renderer = build(
        render_chunk=262144, ray_block=1024, max_hits=48, budget=0,
        n_samples=1024, step_cap=320, compute_dtype="bfloat16", net_chunk=32768,
        cull_budget=448,
        # Round-4 sweep winner (exact by branching, same golden).  tri512 beat
        # tri0 by +11.4% (runlogs/round4/queue.log); tri384 then beat tri512
        # in two independent in-frame bench A/Bs (+8.2% phase C, +4.6% phase G
        # — runlogs/round4c & round4g/queue.log; PERF §2.12).
        tri_cull_budget=int(os.environ.get("NERFTEX_BENCH_TRI_CULL", "384")),
    )
    data = {k: jax.device_put(v) for k, v in ray_data(512, 512).items()}
    jax.block_until_ready(list(data.values()))

    out = renderer(**data, training=False, key=jax.random.key(0))
    jax.block_until_ready(out["color_pred"])  # compile + warmup

    best = float("inf")
    for trial in range(5):
        t0 = time.perf_counter()
        out = renderer(**data, training=False, key=jax.random.key(1))
        jax.block_until_ready(out["color_pred"])
        best = min(best, time.perf_counter() - t0)

    rays_per_sec = 512 * 512 / best
    _check_golden(out, write="--write-golden" in sys.argv)

    print(
        json.dumps(
            {
                "metric": "carpet_render_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
