from .loss import RateDistortionLoss, ScalableRateDistortionLoss
from .optimizers import configure_optimizers, ReduceLROnPlateau
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step

__all__ = [
    "RateDistortionLoss",
    "ScalableRateDistortionLoss",
    "configure_optimizers",
    "ReduceLROnPlateau",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
