from .state import TrainState, create_train_state, make_optimizer
from .steps import make_train_step, make_eval_step, make_predict_fn

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
]
