from .loop import VAETrainer, resolve_ar_settings
from .state import GanTrainState, create_train_state
from .steps import LossConfig, make_eval_step, make_inference_fn, make_train_step

__all__ = [
    "GanTrainState",
    "LossConfig",
    "VAETrainer",
    "create_train_state",
    "make_eval_step",
    "make_inference_fn",
    "make_train_step",
    "resolve_ar_settings",
]
