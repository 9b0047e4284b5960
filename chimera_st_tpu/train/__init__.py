from .train_step import (
    TrainState,
    create_train_state,
    make_apply_gradients,
    make_microbatch_grad_fn,
    make_train_step,
    make_valid_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_apply_gradients",
    "make_microbatch_grad_fn",
    "make_train_step",
    "make_valid_step",
]
