from audiodenoiser_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_train_state,
    shard_variables,
)
from audiodenoiser_tpu.parallel.spatial import (
    RECEPTIVE_RADIUS,
    denoise_spec_sharded,
    make_seq_mesh,
)
from audiodenoiser_tpu.parallel.hybrid import launch_hybrid_check
from audiodenoiser_tpu.parallel.pipeline import PipelinedDenoiser, make_stages
from audiodenoiser_tpu.parallel.pipeline_train import (
    PipelineTrainer,
    PipeTrainState,
    schedule_1f1b,
)

__all__ = [
    "PipelinedDenoiser",
    "PipelineTrainer",
    "PipeTrainState",
    "schedule_1f1b",
    "launch_hybrid_check",
    "make_stages",
    "RECEPTIVE_RADIUS",
    "denoise_spec_sharded",
    "make_seq_mesh",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_batch",
    "shard_train_state",
    "shard_variables",
]
