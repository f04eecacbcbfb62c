from audiodenoiser_tpu.train.loop import (
    TrainState,
    create_train_state,
    eval_step,
    fit,
    train_step,
)
from audiodenoiser_tpu.train.checkpoints import (
    export_model,
    load_exported,
    restore_train_state,
    save_train_state,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "fit",
    "export_model",
    "load_exported",
    "save_train_state",
    "restore_train_state",
]
