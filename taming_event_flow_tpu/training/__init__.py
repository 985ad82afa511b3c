from .step import (
    TrainState,
    make_train_step,
    make_forward_fn,
    make_eval_step,
    make_eval_window_step,
    build_optimizer,
    reset_carry,
)

__all__ = [
    "TrainState",
    "make_train_step",
    "make_forward_fn",
    "make_eval_step",
    "make_eval_window_step",
    "build_optimizer",
    "reset_carry",
]
