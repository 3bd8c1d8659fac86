"""Classification trainer: multi-task lumbar-spine grading.

Capability parity with reference ClassificationTrainer/ClassificationConfig
(trainers/classification.py:45-559): per-task training-time overrides (label
smoothing for multiclass, optional focal loss for binary), weighted sampling
on a chosen label, ClassifierMetrics-based validation with F1 checkpointing,
label-distribution + confusion visualizations, and test-set evaluation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.core import logger, register_trainer
from spine_vision_tpu.core.tasks import (
    AVAILABLE_TASK_NAMES,
    TaskConfig,
    compute_probabilities_for_tasks,
    get_task,
)
from spine_vision_tpu.data.datasets import (
    ClassificationDataset,
    collate_classification,
)
from spine_vision_tpu.data.loader import (
    DataLoader,
    compute_inverse_frequency_weights,
)
from spine_vision_tpu.metrics import ClassifierMetrics
from spine_vision_tpu.models import Classifier, make_multitask_loss_fn
from spine_vision_tpu.ops.augment import AugmentConfig, augment_batch
from spine_vision_tpu.ops.image import imagenet_normalize
from spine_vision_tpu.parallel import is_main_process
from spine_vision_tpu.train.trainer import (
    BaseTrainer,
    TrainingConfig,
    TrainingResult,
    _resolve_use_pallas,
)


def create_tasks_for_training(
    target_labels: list[str] | None = None,
    label_smoothing: float = 0.1,
    use_focal_loss: bool = False,
    focal_gamma: float = 2.0,
    focal_alpha: float | None = None,
) -> list[TaskConfig]:
    """Task configs with training-time overrides applied
    (reference classification.py:45-88)."""
    if target_labels is None:
        labels_to_use = list(AVAILABLE_TASK_NAMES)
    else:
        invalid = set(target_labels) - set(AVAILABLE_TASK_NAMES)
        if invalid:
            raise ValueError(
                f"Invalid target labels: {invalid}. Available: {AVAILABLE_TASK_NAMES}"
            )
        if len(set(target_labels)) != len(target_labels):
            # A duplicate task would be summed twice in the multi-task loss
            # (the model dedups heads, so the duplicate silently doubles
            # that task's weight).
            raise ValueError(f"Duplicate target labels: {target_labels}")
        labels_to_use = list(target_labels)

    tasks: list[TaskConfig] = []
    for label in labels_to_use:
        task = get_task(label)
        overrides: dict[str, Any] = {}
        if task.is_multiclass:
            overrides["label_smoothing"] = label_smoothing
        elif task.is_binary:
            overrides["use_focal_loss"] = use_focal_loss
            overrides["focal_gamma"] = focal_gamma
            overrides["focal_alpha"] = focal_alpha
        tasks.append(task.with_overrides(**overrides) if overrides else task)
    return tasks


class ClassificationConfig(TrainingConfig):
    """Configuration for multi-task classification training."""

    task: str = "classification"
    data_path: Path = Path("data/processed/classification")

    backbone: str = "resnet18"
    pretrained: bool = True
    dropout: float = 0.3
    freeze_backbone_epochs: int = 0
    label_smoothing: float = 0.1

    use_weighted_sampling: bool = True
    sampler_label: str | None = None

    levels: list[str] | None = None
    series_types: list[str] | None = None
    target_labels: list[str] | None = None

    output_size: tuple[int, int] = (256, 256)
    augment: bool = True

    use_pallas_mlp: bool | None = None
    """Fused Pallas ConvNeXt-MLP kernel (custom VJP) — TPU-only, no effect
    on non-ConvNeXt backbones. See LocalizationConfig.use_pallas_mlp."""

    use_pallas_dwconv: bool = False
    """Also use the fused Pallas dwconv+LayerNorm kernel (custom VJP);
    requires use_pallas_mlp. TPU-only."""

    norm_impl: str = "tpu"
    """ResNet-family BatchNorm implementation: "tpu" (fused bf16,
    ops/batchnorm.py) or "flax" (nn.BatchNorm). Same variable layout."""

    pool_impl: str = "flax"
    """ResNet-family stem max pool: "tpu" (scatter-free, ops/pool.py) or
    "flax" (nn.max_pool / select_and_scatter gradient)."""

    use_focal_loss: bool = False
    focal_gamma: float = 2.0
    focal_alpha: float | None = None

    visualize_predictions: bool = True
    num_visualization_samples: int = 16
    max_samples_per_cell: int = 4


@register_trainer("classification", config_cls=ClassificationConfig)
class ClassificationTrainer(BaseTrainer[ClassificationConfig]):
    """Trainer for multi-task lumbar-spine classification."""

    def __init__(
        self,
        config: ClassificationConfig,
        model: Classifier | None = None,
        train_dataset: ClassificationDataset | None = None,
        val_dataset: ClassificationDataset | None = None,
    ) -> None:
        if train_dataset is None:
            train_dataset = ClassificationDataset(
                data_path=config.data_path,
                split="train",
                val_ratio=config.val_split,
                levels=config.levels,
                series_types=config.series_types,
                target_labels=config.target_labels,
                output_size=config.output_size,
                augment=config.augment,
                seed=config.seed,
            )
        if val_dataset is None:
            val_dataset = ClassificationDataset(
                data_path=config.data_path,
                split="val",
                val_ratio=config.val_split,
                levels=config.levels,
                series_types=config.series_types,
                target_labels=config.target_labels,
                output_size=config.output_size,
                augment=False,
                seed=config.seed,
            )

        target_labels = config.target_labels or list(AVAILABLE_TASK_NAMES)

        sample_weights = None
        if config.use_weighted_sampling and len(train_dataset) > 0:
            sampler_label = config.sampler_label or target_labels[0]
            sample_weights = compute_inverse_frequency_weights(
                train_dataset.sample_label_values(sampler_label)
            )
            logger.info("Using weighted sampling based on '%s' label", sampler_label)

        tasks = create_tasks_for_training(
            target_labels=config.target_labels,
            label_smoothing=config.label_smoothing,
            use_focal_loss=config.use_focal_loss,
            focal_gamma=config.focal_gamma,
            focal_alpha=config.focal_alpha,
        )
        if model is None:
            model = Classifier(
                backbone_name=config.backbone,
                tasks=tuple(tasks),
                dropout=config.dropout,
                dtype=jnp.bfloat16 if config.mixed_precision else jnp.float32,
                use_pallas=_resolve_use_pallas(
                    config.use_pallas_mlp, config.use_pallas_dwconv
                ),
                norm_impl=config.norm_impl,
                pool_impl=config.pool_impl,
            )

        self._tasks = tasks
        self._target_labels = target_labels
        self._multitask_loss = make_multitask_loss_fn(tasks)
        self._augment_enabled = config.augment
        # No horizontal flip for classification (reference classification
        # dataset transforms have no HFlip, datasets/classification.py:254-266).
        self._aug_cfg = AugmentConfig(hflip_prob=0.0, flip_coords=False)

        super().__init__(
            config,
            model,
            train_dataset,
            val_dataset,
            sample_weights=sample_weights,
            collate_fn=collate_classification,
        )

        self.metrics = ClassifierMetrics(target_labels=target_labels)
        from spine_vision_tpu.viz.visualizer import TrainingVisualizer

        self.visualizer = TrainingVisualizer(
            output_path=config.logs_path,
            output_mode="image",
            tracker=self.tracker,
        )

    # ------------------------------------------------------------------
    # Traced pieces
    # ------------------------------------------------------------------

    def frozen_backbone_at_start(self) -> bool:
        return self.config.freeze_backbone_epochs > 0

    def _preprocess_fn(self) -> Callable:
        augment_enabled = self._augment_enabled
        aug_cfg = self._aug_cfg

        def preprocess(batch: Any, key: jax.Array, train: bool) -> Any:
            images = batch["image"].astype(jnp.float32) / 255.0
            if train and augment_enabled:
                images, _ = augment_batch(key, images, None, aug_cfg)
            images = imagenet_normalize(images)
            return {**batch, "image": images}

        return preprocess

    def _loss_from_outputs(self, outputs: Any, batch: Any) -> jax.Array:
        return self._multitask_loss(
            outputs, batch["targets"], sample_weight=batch.get("_valid")
        )

    # ------------------------------------------------------------------
    # Host-side metrics / hooks
    # ------------------------------------------------------------------

    def _compute_metrics(
        self, outputs_list: list[Any], batches: list[Any]
    ) -> dict[str, float]:
        self.metrics.reset()
        for outputs, batch in zip(outputs_list, batches):
            self.metrics.update(
                {k: np.asarray(v) for k, v in outputs.items()},
                {k: np.asarray(v) for k, v in batch["targets"].items()},
            )
        return self.metrics.compute()

    def on_train_begin(self) -> None:
        if len(self._target_labels) == len(AVAILABLE_TASK_NAMES):
            logger.info("Training on all labels (multi-task)")
        else:
            logger.info("Training on selected labels: %s", self._target_labels)
        if self.config.freeze_backbone_epochs > 0:
            logger.info(
                "Backbone frozen for first %d epochs",
                self.config.freeze_backbone_epochs,
            )
        logger.info("Train dataset stats: %s", self.train_dataset.get_stats())
        if is_main_process():
            self._visualize_label_distribution()

    def on_epoch_begin(self, epoch: int) -> None:
        # self._frozen is BaseTrainer's single source of freeze state.
        if self._frozen and epoch >= self.config.freeze_backbone_epochs:
            logger.info("Unfreezing backbone at epoch %d", epoch + 1)
            self.set_backbone_frozen(False)

    def on_train_end(self, result: TrainingResult) -> None:
        # Curves only: the final test evaluation is the caller's step (the
        # CLI runs trainer.evaluate(visualize=...) right after train() —
        # evaluating here too ran the whole test split twice, and hid the
        # evaluation inside a plotting try-block so a matplotlib failure
        # silently skipped the test metrics).
        if is_main_process():
            try:
                self.visualizer.plot_training_curves(
                    self.history, filename="training_curves"
                )
            except Exception as exc:
                logger.warning("Final visualization failed: %s", exc)
            logger.info("Visualizations saved to: %s", self.config.logs_path)

    def get_metric_for_checkpoint(
        self, val_loss: float | None, metrics: dict[str, float]
    ) -> float:
        if "f1" in metrics:
            return -metrics["f1"]
        if "macro_f1" in metrics:
            return -metrics["macro_f1"]
        if val_loss is not None:
            return val_loss
        return (
            self.history["train_loss"][-1]
            if self.history["train_loss"]
            else float("inf")
        )

    def _make_test_dataset(self) -> ClassificationDataset:
        return ClassificationDataset(
            data_path=self.config.data_path,
            split="test",
            val_ratio=self.config.val_split,
            levels=self.config.levels,
            series_types=self.config.series_types,
            target_labels=self.config.target_labels,
            output_size=self.config.output_size,
            augment=False,
            seed=self.config.seed,
        )

    def _visualize_label_distribution(self) -> None:
        try:
            test_dataset = self._make_test_dataset()
            distributions = {
                "train": self.train_dataset.get_label_distribution(),
                "test": test_dataset.get_label_distribution(),
            }
            val_size = 0
            if self.val_dataset is not None:
                distributions["val"] = self.val_dataset.get_label_distribution()
                val_size = len(self.val_dataset)
            logger.info(
                "Split sizes - Train: %d, Val: %d, Test: %d",
                len(self.train_dataset),
                val_size,
                len(test_dataset),
            )
            self.visualizer.plot_label_distribution(
                distributions=distributions,
                target_labels=self._target_labels,
                filename="label_distribution",
            )
        except Exception as exc:
            logger.warning("Label-distribution visualization failed: %s", exc)

    def evaluate(
        self,
        test_dataset: ClassificationDataset | None = None,
        visualize: bool = False,
        max_samples_per_cell: int | None = None,
    ) -> dict[str, float]:
        """Evaluate on the test split with optional confusion visualizations
        (reference classification.py:456-559)."""
        import jax

        if jax.process_count() > 1:
            # Host-side metric accumulation needs the full output set; in a
            # multi-process run each host holds only its shard (and fetching
            # non-addressable shards raises). Evaluate the checkpoint in a
            # single-process session instead.
            raise NotImplementedError(
                "evaluate() is single-controller only; load the checkpoint "
                "in a single-process session to compute test metrics"
            )
        if test_dataset is None:
            test_dataset = self._make_test_dataset()
        if len(test_dataset) == 0:
            logger.warning("Empty test dataset; skipping evaluation")
            return {}

        loader = DataLoader(
            test_dataset,
            batch_size=self.config.batch_size,
            shuffle=False,
            drop_last=False,
            seed=self.config.seed,
            collate_fn=collate_classification,
            num_workers=self.config.num_workers,
        )
        self.metrics.reset()
        all_probs: dict[str, list[np.ndarray]] = {
            label: [] for label in self._target_labels
        }
        all_targets: dict[str, list[np.ndarray]] = {
            label: [] for label in self._target_labels
        }
        all_images: list[np.ndarray] = []
        all_metadata: list[dict[str, Any]] = []

        for batch in loader:
            device_batch, n_valid = self._shard_eval(batch)
            outputs, _ = self._eval_step(self.state, device_batch)
            batch = self._trim_batch(batch, n_valid)  # drop loader duplicates
            outputs_np = self._slice_outputs(outputs, n_valid)
            self.metrics.update(outputs_np, batch["targets"])
            if visualize and is_main_process():
                # Only the plotting process pays the RAM for raw test images.
                probs = compute_probabilities_for_tasks(outputs_np, self._tasks)
                for label in self._target_labels:
                    if label in probs:
                        all_probs[label].append(probs[label])
                    if label in batch["targets"]:
                        all_targets[label].append(np.asarray(batch["targets"][label]))
                all_images.extend(np.asarray(batch["image"]))
                all_metadata.extend(batch.get("metadata", []))

        metrics = self.metrics.compute()
        logger.info("Test Results:")
        for key, value in sorted(metrics.items()):
            logger.info("  %s: %.4f", key, value)
        if self.tracker is not None:
            self.tracker.log_metrics({f"test/{k}": v for k, v in metrics.items()})

        if visualize and is_main_process() and all_metadata:
            try:
                pred_arrays = {
                    k: np.concatenate(v, axis=0) for k, v in all_probs.items() if v
                }
                target_arrays = {
                    k: np.concatenate(v, axis=0) for k, v in all_targets.items() if v
                }
                self.visualizer.plot_classification_metrics(
                    metrics=metrics,
                    target_labels=self._target_labels,
                    filename="test_metrics",
                )
                self.visualizer.plot_confusion_matrices_with_samples(
                    images=all_images,
                    predictions=pred_arrays,
                    targets=target_arrays,
                    target_labels=self._target_labels,
                    metadata=all_metadata,
                    max_samples_per_cell=(
                        max_samples_per_cell
                        if max_samples_per_cell is not None
                        else self.config.max_samples_per_cell
                    ),
                    filename_prefix="confusion_matrix_samples",
                )
                self.visualizer.plot_confusion_summary(
                    predictions=pred_arrays,
                    targets=target_arrays,
                    target_labels=self._target_labels,
                    filename="confusion_summary",
                )
                logger.info(
                    "Test visualizations saved to: %s", self.config.logs_path
                )
            except Exception as exc:
                logger.warning("Test visualization failed: %s", exc)

        return metrics
