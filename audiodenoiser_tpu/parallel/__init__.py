from audiodenoiser_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_train_state,
    shard_variables,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_batch",
    "shard_train_state",
    "shard_variables",
]
