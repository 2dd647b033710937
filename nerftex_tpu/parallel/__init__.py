from nerftex_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    model_shardings,
    make_parallel_train_step,
    shard_render,
)
