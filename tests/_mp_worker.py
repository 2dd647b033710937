"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed CPU job running the real dp train step + checkpoint save.

Usage: python tests/_mp_worker.py <process_id> <port> <out_dir>
Env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""

import json
import os
import sys


def main(pid: int, port: str, out_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from nerftex_tpu.parallel import init_distributed

    assert init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert jax.process_count() == 2
    n = len(jax.devices())
    assert n == 8, f"expected 8 global devices, got {n}"

    import numpy as np

    from __graft_entry__ import _flagship, _example_batch
    from nerftex_tpu.parallel.mesh import make_mesh, make_parallel_train_step
    from nerftex_tpu.render.train import make_optimizer
    from nerftex_tpu.render.loss import AlphaLoss
    from nerftex_tpu.render.checkpoint import CheckpointManager

    # Identical seeds -> identical host-side init on both processes
    # (single-controller-style replicated data pipeline).
    models, renderer = _flagship(depth=4, width=64)
    renderer.n_samples = 8
    params = renderer.current_params()
    batch = _example_batch(b=2, r=32)

    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    optimizer = make_optimizer(5e-4, 500)
    mesh = make_mesh(8, shape=(8, 1))  # pure dp across both processes

    step, place_params, place_batch = make_parallel_train_step(
        renderer, loss_fn, optimizer, mesh, False, [1, 1, 1.0], batch, params
    )
    placed = place_params(params)
    opt_state = optimizer.init(placed)
    new_params, opt_state, loss = step(
        placed, opt_state, place_batch(batch), jax.random.key(0)
    )
    loss = float(loss)

    # Single-writer discipline, no monkeypatching: a per-process private
    # directory shows whether THIS process's save() touched disk at all,
    # while the shared directory carries the real checkpoint.
    priv_dir = os.path.join(out_dir, f"private_{pid}")
    CheckpointManager(priv_dir).save({"model": new_params}, 1)

    shared_dir = os.path.join(out_dir, "shared")
    manager = CheckpointManager(shared_dir)
    manager.save({"model": new_params, "step": 1}, 1)

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("checkpoint-written")

    # Every process can restore process 0's write and match its own state.
    restored = manager.restore_latest()
    assert restored is not None and restored["step"] == 1
    for a, b in zip(jax.tree.leaves(restored["model"]), jax.tree.leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    result = {
        "process": pid,
        "process_count": jax.process_count(),
        "loss": loss,
        "shared": sorted(os.listdir(shared_dir)),
        "private": sorted(os.listdir(priv_dir)),
    }
    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
