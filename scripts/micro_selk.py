"""On-chip microbench: XLA sel_k overlap-resolution chain vs the Pallas
fused kernel (kernels/selk_resolve.py), at the shipped scene tiers.

The plush trace puts the XLA chain at 10.97 ms/exec for the S=320 K=128
tier (~488 ms of the frame, PERF.md 2.17); the kernel evaluates the same
chain VMEM-resident (~15 VPU ops per (s,k) element, no [Rb,S,K] HBM
traffic).  Each variant runs as ONE fused device program (fori_loop,
carry reduces over every output — micro_select.py discipline) and is
checked against the XLA chain before timing.

Usage: PYTHONPATH=/root/repo python scripts/micro_selk.py [--reps 10]
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--s-rows", type=int, default=8)
    ap.add_argument("--lanes", type=int, default=128)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, "tests")
    from test_selk_kernel import _ref_chain, _inputs
    from nerftex_tpu.kernels.selk_resolve import selk_resolve

    def bench(name, fn, ins, reps):
        def run(a):
            def body(i, c):
                out = fn(*(x + c if j == 5 else x for j, x in enumerate(a)))
                tot = sum(
                    jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
                )
                return tot * jnp.float32(1e-38)

            last = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return fn(*a), last

        f = jax.jit(run)
        out = jax.block_until_ready(f(ins))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(ins))
        dt = (time.perf_counter() - t0) / (reps + 1)
        print(f"  {name:34s} {dt * 1e3:8.3f} ms/iter", flush=True)
        return out[0], dt

    tiers = [
        ("plush S320 K128", 2048, 320, 128),
        ("grass S1024 K96", 2048, 1024, 96),
        ("carpet S320 K48", 1024, 320, 48),
    ]
    for method in ("nearest_blend", "random"):
        for tag, rb, s, k in tiers:
            ins = _inputs(jax.random.key(0), rb, s, k)
            ins = tuple(jax.device_put(x) for x in ins)
            print(f"{method} @ {tag} [{rb}x{s}x{k}]", flush=True)

            def xla_fn(*a):
                sel, p, n, _ = _ref_chain(*a, method, 0.15)
                return sel, p, n

            def ker_fn(*a):
                return selk_resolve(
                    *a, method=method, blend_range=0.15,
                    s_rows=args.s_rows, lanes=args.lanes,
                )

            o_x, dt_x = bench("xla chain", xla_fn, ins, args.reps)
            o_k, dt_k = bench("pallas selk", ker_fn, ins, args.reps)
            mism = (np.asarray(o_x[0]) != np.asarray(o_k[0])).mean()
            dn = (np.asarray(o_x[2]) != np.asarray(o_k[2])).mean()
            print(
                f"  sel_k mismatch {mism:.2e} (knife edges), n_active "
                f"mismatch {dn:.2e} | speedup {dt_x / dt_k:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
