from .trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    linear_decay_schedule,
    parse_remat_env,
)
from .checkpoints import (
    save_model_weights,
    load_model_weights,
    save_train_checkpoint,
    load_train_checkpoint,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "linear_decay_schedule",
    "parse_remat_env",
    "save_model_weights",
    "load_model_weights",
    "save_train_checkpoint",
    "load_train_checkpoint",
]
