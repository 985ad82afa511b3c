from .step import TrainState, make_train_step, make_forward_fn, build_optimizer, reset_carry

__all__ = [
    "TrainState",
    "make_train_step",
    "make_forward_fn",
    "build_optimizer",
    "reset_carry",
]
