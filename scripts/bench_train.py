"""Carpet-train throughput benchmark (BASELINE.md training row).

Workload = config_carpet_train.py's step: 4 images x 256 rays x 256 samples
through the 8x256 ParamNerf (n_parameters=[1,6]), AlphaLoss(smape, mse),
Adam(5e-4, eps=1e-7) — i.e. 262,144 MLP points forward + backward per step
(reference train.py:60-67).

K steps are fused into one lax.fori_loop device program so the tunnel's
async-dispatch latency cannot inflate the number (wall time / K is true
device throughput; see CLAUDE.md gotchas).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=50, help="steps fused per device program")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--dtype", default="float32",
        help="model compute dtype (bfloat16 = mixed precision: bf16 matmuls/"
             "activations, f32 master params + Adam state)",
    )
    ap.add_argument("--trace", default=None, help="capture a jax.profiler trace of one warm K-step program into DIR")
    ap.add_argument(
        "--net-chunk", type=int, default=65536,
        help="MLP minibatch; >= 262144 evaluates the whole step in one batch "
             "(no scan, no activation stacking — see docs/PERF.md)",
    )
    ap.add_argument(
        "--remat", nargs="?", const=True, default=False,
        choices=[True, False, "save_encodings"],
        type=lambda s: {"1": True, "true": True, "0": False, "false": False}
                       .get(s.lower(), s),
        help="jax.checkpoint the net_chunk bodies (recompute instead of "
             "stacking activations, docs/PERF.md §1); pass "
             "'save_encodings' to keep encoder outputs saved (§1.5); "
             "unknown values are rejected, not coerced",
    )
    ap.add_argument(
        "--unroll", type=int, default=1,
        help="net-chunk scan unroll factor (renderer net_chunk_unroll, "
             "docs/PERF.md §1.6: amortizes the per-chunk per-leaf gradient-"
             "accumulate fusion overhead; grads match unroll=1 to ~1 ulp)",
    )
    ap.add_argument(
        "--cast-once", action="store_true",
        help="cast params to the compute dtype once per step, outside the "
             "net-chunk scan: weight-grad accumulation stays in the compute "
             "dtype/layout across chunks and converts to f32 once "
             "(docs/PERF.md §1.7)",
    )
    ap.add_argument(
        "--flat-params", action="store_true",
        help="single flat theta per model: one wide grad accumulate + one "
             "fused Adam chain instead of per-leaf small ops (docs/PERF.md "
             "§1.4)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nerftex_tpu.utils import util, rng
    from nerftex_tpu.utils.util import EasyDict
    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0

    models = util.instantiate(EasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 10},
        "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "n_parameters": [1, 6], "compute_dtype": args.dtype,
    }))
    renderer = util.instantiate(EasyDict({
        "module": "network.renderer.Renderer",
        "n_samples": 256, "render_chunk": 32768, "net_chunk": args.net_chunk,
        "remat_net_chunks": args.remat,
        "net_chunk_unroll": args.unroll,
        "cast_params_once": args.cast_once,
        "perturb": True, "raw_noise_std": 0.0, **models,
    }))
    loss_fn = util.instantiate(EasyDict({
        "module": "network.loss.AlphaLoss",
        "loss_fn": "network.loss.smape",
        "alpha_loss_fn": "network.loss.mse",
    }))
    optimizer = optax.adam(5e-4, b1=0.9, b2=0.999, eps=1e-7)

    if args.flat_params:
        from nerftex_tpu.render.train import apply_flat_param_space

        apply_flat_param_space(models)

    # Synthetic batch with the training shapes (4 imgs x 256 rays).
    rs = np.random.RandomState(0)
    B, R = 4, 256
    rays_o = np.tile([0, 0, 3.0], (B, R, 1)).astype(np.float32)
    d = rs.normal(size=(B, R, 3)).astype(np.float32)
    d[..., 2] = -np.abs(d[..., 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(rays_o),
        "rays_d": jnp.asarray(d),
        "t": jnp.asarray(np.tile([1.0, 5.0], (B, R, 1)).astype(np.float32)),
        "cone_scale": jnp.full((B, R, 1), 1e-3, jnp.float32),
        "parameters": jnp.asarray(rs.uniform(0, 1, (B, 7)).astype(np.float32)),
        "color": jnp.asarray(rs.uniform(0, 1, (B, R, 3)).astype(np.float32)),
        "alpha": jnp.asarray(rs.uniform(0, 1, (B, R)).astype(np.float32)),
    }

    def loss_of(params, key):
        pred = renderer.apply(params, batch, key, training=True)
        return loss_fn(color_true=batch["color"], alpha_true=batch["alpha"], **pred)

    def one_step(i, carry):
        params, opt_state, key, _ = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_of)(params, sub)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    @jax.jit
    def run_k(params, opt_state, key):
        return jax.lax.fori_loop(
            0, args.k, one_step, (params, opt_state, key, jnp.float32(0))
        )

    params = {"model": models["model"].params}
    opt_state = optimizer.init(params)
    key = jax.random.key(0)

    t0 = time.perf_counter()
    params, opt_state, key, loss = run_k(params, opt_state, key)
    jax.block_until_ready(loss)
    print(f"first {args.k} steps (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

    for _ in range(args.reps):
        t0 = time.perf_counter()
        params, opt_state, key, loss = run_k(params, opt_state, key)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        print(f"{args.k} steps: {dt:.2f}s -> {args.k/dt:.1f} steps/s "
              f"(loss {float(loss):.4f})", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            params, opt_state, key, loss = run_k(params, opt_state, key)
            jax.block_until_ready(loss)
        print(f"trace -> {args.trace}", flush=True)


if __name__ == "__main__":
    main()
