"""Benchmark: instanced carpet render throughput (one JSON line).

Workload = the north-star render (BASELINE.md): config_carpet_render shapes —
512x512 rays, n_samples cap 1024, step 0.002, 900 patch instances over the
cloth mesh, nearest overlap selection, checkerboard parameter texture,
directional light — rendered fully on-device (instancer + conditioned MLP +
compositing in one jit per chunk).

vs_baseline derivation (both sides measured on THIS machine, 2026-08-16):
the reference implementation cannot run its renderer here (Embree is not
installed), so the baseline is the reference's *best-case ceiling*: its
TF-CPU conditioned-MLP forward throughput (86,733 points/s, TF 2.21 + legacy
keras, net_chunk 32768) divided by the measured mean of 128.5 valid samples
per ray on this exact scene = 675 rays/s.  This ignores the reference's
serial per-ray Embree walk entirely (instancer.cpp:772), i.e. it is generous
to the reference.  The reference's measured *training* rate on this CPU is
0.0705 steps/s vs 52.9 steps/s here (750x) — see scripts/bench_train.py.
"""

import json
import time

import numpy as np

REFERENCE_CPU_RAYS_PER_SEC = 675.0


def main():
    import jax

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_render import build, ray_data

    # Grid mode (budget=0): dense [R, step_cap] marching grid, no
    # compaction machinery.  step_cap=256 covers this scene's occupancy
    # (p100 = 227 steps); any truncation would print an overflow warning.
    # bfloat16 MLP activations (inference only): validated at 71-73 dB PSNR
    # agreement with the f32 path on the trained carpet demo renders —
    # orders of magnitude inside the 0.1 dB parity tolerance.
    renderer = build(
        render_chunk=32768, ray_block=2048, max_hits=32, budget=0,
        n_samples=1024, step_cap=256, compute_dtype="bfloat16",
    )
    data = ray_data(512, 512)

    out = renderer(**data, training=False, key=jax.random.key(0))
    jax.block_until_ready(out["color_pred"])  # compile + warmup

    t0 = time.perf_counter()
    out = renderer(**data, training=False, key=jax.random.key(1))
    jax.block_until_ready(out["color_pred"])
    dt = time.perf_counter() - t0

    rays_per_sec = 512 * 512 / dt
    alpha = np.asarray(out["alpha_pred"])
    assert np.isfinite(alpha).all() and alpha.max() > 0.01

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
