from .state import TrainState, create_train_state, make_optimizer
from .steps import make_train_step, make_eval_step, make_predict_fn
from .base_trainer import BaseTrainer
from .al_config import ALConfig
from .al_trainer import ALTrainer

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
    "BaseTrainer",
    "ALConfig",
    "ALTrainer",
]
