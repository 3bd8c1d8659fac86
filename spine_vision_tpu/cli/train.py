"""Training and evaluation CLI entry points.

Capability parity with reference cli/train.py:18-109 (banner logging,
train + test-split evaluation), plus the ``evaluate`` command the reference
documents but never wired (SURVEY.md §1 note — README.md:53-55 advertises
``spine-vision test``/``evaluate`` with no implementation behind them).
"""

from __future__ import annotations

from spine_vision_tpu.core import logger
from spine_vision_tpu.train.classification import (
    ClassificationConfig,
    ClassificationTrainer,
)
from spine_vision_tpu.train.localization import LocalizationConfig, LocalizationTrainer


def train_localization(config: LocalizationConfig) -> dict[str, float]:
    """Train the coordinate regressor, then evaluate on the test split."""
    logger.info("=" * 60)
    logger.info("IVD Localization Training")
    logger.info("Backbone: %s @ %s", config.backbone, config.image_size)
    logger.info("Output: %s", config.output_path)
    logger.info("=" * 60)
    trainer = LocalizationTrainer(config)
    result = trainer.train()
    logger.info(
        "Training done: best %s at epoch %d",
        f"{result.best_metric:.4f}",
        result.best_epoch + 1,
    )
    return trainer.evaluate()


def train_classification(config: ClassificationConfig) -> dict[str, float]:
    """Train the multi-task grader, then evaluate on the test split."""
    logger.info("=" * 60)
    logger.info("IVD Multi-task Classification Training")
    logger.info("Backbone: %s @ %s", config.backbone, config.output_size)
    logger.info("Output: %s", config.output_path)
    logger.info("=" * 60)
    trainer = ClassificationTrainer(config)
    result = trainer.train()
    logger.info(
        "Training done: best %s at epoch %d",
        f"{result.best_metric:.4f}",
        result.best_epoch + 1,
    )
    return trainer.evaluate()


def evaluate_localization(config: LocalizationConfig) -> dict[str, float]:
    """Evaluate a localization checkpoint on the test split (no training)."""
    if config.checkpoint_path is None:
        raise SystemExit("evaluate requires --checkpoint-path")
    trainer = LocalizationTrainer(config)
    trainer._load(config.checkpoint_path)
    return trainer.evaluate()


def evaluate_classification(config: ClassificationConfig) -> dict[str, float]:
    """Evaluate a classification checkpoint on the test split (no training)."""
    if config.checkpoint_path is None:
        raise SystemExit("evaluate requires --checkpoint-path")
    trainer = ClassificationTrainer(config)
    trainer._load(config.checkpoint_path)
    return trainer.evaluate()
