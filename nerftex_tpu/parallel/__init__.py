from nerftex_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    model_shardings,
    make_parallel_train_step,
    shard_render,
)


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up: jax.distributed for DCN-coordinated multi-slice
    jobs (SURVEY.md §5 'communication backend').  Single-process runs are a
    no-op; with arguments (or the JAX_COORDINATOR_ADDRESS etc. env vars set),
    initializes the distributed runtime so jax.devices() spans all hosts."""
    import os

    import jax

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
