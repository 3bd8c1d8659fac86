"""Training: state, jitted steps, schedules, checkpoints, trainers."""

from spine_vision_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from spine_vision_tpu.train.classification import (
    ClassificationConfig,
    ClassificationTrainer,
    create_tasks_for_training,
)
from spine_vision_tpu.train.localization import LocalizationConfig, LocalizationTrainer
from spine_vision_tpu.train.schedules import (
    build_lr_schedule,
    build_optimizer,
    current_lr,
    set_lr,
)
from spine_vision_tpu.train.state import TrainState
from spine_vision_tpu.train.steps import make_eval_step, make_predict_fn, make_train_step
from spine_vision_tpu.train.trainer import (
    BaseTrainer,
    EpochResult,
    TrainingConfig,
    TrainingResult,
    generate_run_id,
)

__all__ = [
    "BaseTrainer",
    "ClassificationConfig",
    "ClassificationTrainer",
    "EpochResult",
    "LocalizationConfig",
    "LocalizationTrainer",
    "TrainState",
    "TrainingConfig",
    "TrainingResult",
    "build_lr_schedule",
    "build_optimizer",
    "create_tasks_for_training",
    "current_lr",
    "generate_run_id",
    "load_checkpoint",
    "make_eval_step",
    "make_predict_fn",
    "make_train_step",
    "save_checkpoint",
    "set_lr",
]
