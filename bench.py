"""Benchmark: carpet-train step rate on the current backend (one JSON line).

Workload = the reference's exact carpet training step (SURVEY.md §6):
4 images x 256 rays x 256 samples = 262,144 MLP points per step through the
8x256 ParamNerf, AlphaLoss(smape+mse), Adam — renderer + loss + grads +
update.  K steps run inside one device-side lax.fori_loop so the measurement
is sustained on-chip throughput, not per-dispatch tunnel latency (the axon
TPU tunnel adds ~30 ms RPC per call).

vs_baseline compares against the reference implementation measured on THIS
machine's CPU (TF eager, as shipped — network/train.py:60-67 hot loop with
the reference's model/renderer/loss at identical shapes): 0.0705 steps/s
(14.19 s/step), measured 2026-08-16 with TF 2.21 + legacy keras.  The
north-star render benchmark (instanced carpet rays/sec) is added once the
device instancer lands.
"""

import json
import time

import numpy as np

REFERENCE_TF_CPU_STEPS_PER_SEC = 0.0705


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship, _example_batch
    from nerftex_tpu.render.train import make_optimizer
    from nerftex_tpu.render.loss import AlphaLoss

    models, renderer = _flagship()
    renderer.n_samples = 256
    params = renderer.current_params()

    batch = {k: jax.device_put(v) for k, v in _example_batch(b=4, r=256).items()}

    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    optimizer = make_optimizer(5e-4, 500)

    def loss_of(p, key):
        pred = renderer.apply(p, batch, key, training=True)
        return loss_fn(color_true=batch["color"], alpha_true=batch["alpha"], **pred)

    K = 50

    @jax.jit
    def multi_step(params, opt_state, key):
        def body(i, carry):
            p, o, _ = carry
            loss, grads = jax.value_and_grad(loss_of)(p, jax.random.fold_in(key, i))
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, loss)

        return jax.lax.fori_loop(0, K, body, (params, opt_state, jnp.float32(0)))

    opt_state = optimizer.init(params)
    out = multi_step(params, opt_state, jax.random.key(0))
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    out = multi_step(out[0], out[1], jax.random.key(1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_sec = K / dt
    assert np.isfinite(float(out[2]))

    print(
        json.dumps(
            {
                "metric": "carpet_train_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_TF_CPU_STEPS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
