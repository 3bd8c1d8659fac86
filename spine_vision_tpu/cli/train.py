"""Training and evaluation CLI entry points.

Capability parity with reference cli/train.py:18-109 (banner logging,
train + test-split evaluation), plus the ``evaluate`` command the reference
documents but never wired (SURVEY.md §1 note — README.md:53-55 advertises
``spine-vision test``/``evaluate`` with no implementation behind them).
"""

from __future__ import annotations

import numpy as np

from spine_vision_tpu.core import logger
from spine_vision_tpu.train.classification import (
    ClassificationConfig,
    ClassificationTrainer,
)
from spine_vision_tpu.train.localization import LocalizationConfig, LocalizationTrainer


def _multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def _log_multiprocess_eval_skip(output_path: str) -> None:
    # Trainer.evaluate() is single-controller only (host-side metric
    # accumulation needs the full output set); a distributed CLI run must
    # not die after a successful training, so point at the offline path.
    logger.info(
        "Skipping test-split evaluation: evaluate() is single-controller "
        "only. Run `spine-vision-tpu evaluate --checkpoint %s` in a "
        "single-process session to compute test metrics.",
        output_path,
    )


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
    if _multiprocess():
        _log_multiprocess_eval_skip(config.output_path)
        return {}
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
    if _multiprocess():
        _log_multiprocess_eval_skip(config.output_path)
        return {}
    return trainer.evaluate(visualize=config.visualize_predictions)


def test_inference_command(
    checkpoint_path: str,
    images: list[str],
    model_kind: str = "classification",
    backbone: str = "resnet18",
    image_size: tuple[int, int] = (256, 256),
) -> dict:
    """Ad-hoc timed inference on image files (the reference README documents
    a ``spine-vision test`` command that was never wired; SURVEY.md §1)."""
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import optax

    from spine_vision_tpu.models import (
        Classifier,
        CoordinateRegressor,
        classifier_test_inference,
        regressor_test_inference,
    )
    from spine_vision_tpu.train.checkpoint import load_checkpoint
    from spine_vision_tpu.train.state import TrainState

    if model_kind == "classification":
        model = Classifier(backbone_name=backbone, dtype=jnp.float32)
    else:
        model = CoordinateRegressor(backbone_name=backbone, dtype=jnp.float32)
    h, w = image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), train=False
    )
    state = TrainState.create(
        params=variables["params"],
        tx=optax.identity(),
        batch_stats=variables.get("batch_stats"),
    )
    state, _ = load_checkpoint(Path(checkpoint_path), state, restore_opt_state=False)

    if model_kind == "classification":
        result = classifier_test_inference(
            model, state.variables(), images, image_size=image_size
        )
        logger.info(
            "Inference on %d images: %.1f ms", result["num_images"],
            result["inference_time_ms"],
        )
        for task, preds in result["predictions"].items():
            logger.info("  %s: %s", task, preds.tolist())
    else:
        result = regressor_test_inference(
            model, state.variables(), images, image_size=image_size
        )
        logger.info(
            "Inference on %d images: %.1f ms", result["num_images"],
            result["inference_time_ms"],
        )
        for i, coords in enumerate(result["pixel_coordinates"]):
            logger.info("  image %d coords: %s", i, np.round(coords, 1).tolist())
    return result


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
