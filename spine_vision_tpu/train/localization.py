"""Localization trainer: ConvNeXt coordinate regression over 5 IVD levels.

Capability parity with reference LocalizationTrainer/LocalizationConfig
(trainers/localization.py:33-533): masked smooth-L1 loss, MED/PCK metrics,
MED-based checkpointing, backbone freeze/unfreeze hook, prediction
visualizations, and test-set evaluation. Augmentation is coordinate-aware and
runs on device (ops.augment) — fixing the reference's label-inconsistent augs.
"""

from __future__ import annotations

from typing import Any, Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.core import logger, register_trainer
from spine_vision_tpu.data.datasets import LocalizationDataset, collate_localization
from spine_vision_tpu.data.levels import IDX_TO_LEVEL, NUM_LEVELS
from spine_vision_tpu.data.loader import DataLoader
from spine_vision_tpu.metrics import LocalizationMetrics
from spine_vision_tpu.models import CoordinateRegressor, make_coordinate_loss_fn
from spine_vision_tpu.ops.augment import AugmentConfig, augment_batch
from spine_vision_tpu.ops.image import imagenet_normalize
from spine_vision_tpu.parallel import is_main_process
from spine_vision_tpu.train.trainer import (
    BaseTrainer,
    TrainingConfig,
    TrainingResult,
    _resolve_use_pallas,
)


class LocalizationConfig(TrainingConfig):
    """Configuration for localization training."""

    task: str = "localization"

    backbone: str = "convnext_base"
    pretrained: bool = True
    freeze_backbone_epochs: int = 0
    dropout: float = 0.2
    loss_type: Literal["mse", "smooth_l1", "huber"] = "smooth_l1"
    num_levels: int = NUM_LEVELS

    series_types: list[str] | None = None
    sources: list[str] | None = None
    image_size: tuple[int, int] = (512, 512)
    augment: bool = True

    use_pallas_mlp: bool | None = None
    """Use the LN-fused Pallas ConvNeXt-MLP kernel (custom VJP, Pallas
    fwd+bwd) in training. None = auto: on for TPU backends (187 vs 140
    img/s for ConvNeXt-base@512 b32), off elsewhere (CPU must interpret).
    No effect on non-ConvNeXt backbones; checkpoints are interchangeable
    either way."""

    use_pallas_dwconv: bool = False
    """Also use the fused Pallas dwconv+LayerNorm kernel (custom VJP, Pallas
    fwd+bwd) in training; requires use_pallas_mlp. TPU-only."""

    norm_impl: str = "tpu"
    """ResNet-family BatchNorm implementation: "tpu" (fused bf16,
    ops/batchnorm.py) or "flax" (nn.BatchNorm). Same variable layout."""

    pool_impl: str = "flax"
    """ResNet-family stem max pool: "tpu" (scatter-free, ops/pool.py) or
    "flax" (nn.max_pool / select_and_scatter gradient)."""

    pck_thresholds: list[float] = [0.02, 0.05, 0.10]
    visualize_predictions: bool = True
    num_visualization_samples: int = 16


@register_trainer("localization", config_cls=LocalizationConfig)
class LocalizationTrainer(BaseTrainer[LocalizationConfig]):
    """Trainer for IVD localization with coordinate regression."""

    def __init__(
        self,
        config: LocalizationConfig,
        model: CoordinateRegressor | None = None,
        train_dataset: LocalizationDataset | None = None,
        val_dataset: LocalizationDataset | None = None,
    ) -> None:
        if model is None:
            model = CoordinateRegressor(
                backbone_name=config.backbone,
                num_outputs=2,
                num_levels=config.num_levels,
                dropout=config.dropout,
                dtype=jnp.bfloat16 if config.mixed_precision else jnp.float32,
                use_pallas=_resolve_use_pallas(
                    config.use_pallas_mlp, config.use_pallas_dwconv
                ),
                norm_impl=config.norm_impl,
                pool_impl=config.pool_impl,
            )
        if train_dataset is None:
            train_dataset = LocalizationDataset(
                data_path=config.data_path,
                split="train",
                val_ratio=config.val_split,
                series_types=config.series_types,
                sources=config.sources,
                image_size=config.image_size,
                augment=config.augment,
                seed=config.seed,
            )
        if val_dataset is None:
            val_dataset = LocalizationDataset(
                data_path=config.data_path,
                split="val",
                val_ratio=config.val_split,
                series_types=config.series_types,
                sources=config.sources,
                image_size=config.image_size,
                augment=False,
                seed=config.seed,
            )

        # Fields used by _preprocess_fn/_loss_from_outputs must exist before
        # super().__init__ compiles the steps.
        self._coord_loss = make_coordinate_loss_fn(config.loss_type)
        self._augment_enabled = config.augment
        self._aug_cfg = AugmentConfig()

        super().__init__(
            config,
            model,
            train_dataset,
            val_dataset,
            collate_fn=collate_localization,
        )

        self.metrics = LocalizationMetrics(
            pck_thresholds=config.pck_thresholds,
            level_names=list(IDX_TO_LEVEL.values()),
        )
        from spine_vision_tpu.viz.visualizer import TrainingVisualizer

        self.visualizer = TrainingVisualizer(
            output_path=config.logs_path,
            output_mode="image",
            tracker=self.tracker,
        )
        self._backbone_unfrozen = config.freeze_backbone_epochs == 0

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
            coords = batch["coords"]
            if train and augment_enabled:
                images, coords = augment_batch(key, images, coords, aug_cfg)
            images = imagenet_normalize(images)
            return {**batch, "image": images, "coords": coords}

        return preprocess

    def _loss_from_outputs(self, outputs: Any, batch: Any) -> jax.Array:
        mask = batch["mask"]
        if "_valid" in batch:  # padded eval rows contribute zero exactly
            mask = mask * batch["_valid"][:, None]
        return self._coord_loss(outputs, batch["coords"], mask)

    # ------------------------------------------------------------------
    # Host-side metrics / hooks
    # ------------------------------------------------------------------

    @staticmethod
    def _flatten_with_mask(
        predictions: np.ndarray, targets: np.ndarray, masks: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """[N, L, 2]/[N, L] -> valid-only ([M, 2], [M, 2], [M]) by mask."""
        valid = masks > 0  # [N, L]
        levels = np.broadcast_to(
            np.arange(masks.shape[1])[None, :], masks.shape
        )
        return (
            predictions[valid].reshape(-1, 2),
            targets[valid].reshape(-1, 2),
            levels[valid].reshape(-1),
        )

    def _compute_metrics(
        self, outputs_list: list[Any], batches: list[Any]
    ) -> dict[str, float]:
        preds = np.concatenate([np.asarray(o) for o in outputs_list], axis=0)
        targets = np.concatenate([np.asarray(b["coords"]) for b in batches], axis=0)
        masks = np.concatenate([np.asarray(b["mask"]) for b in batches], axis=0)
        flat_preds, flat_targets, flat_levels = self._flatten_with_mask(
            preds, targets, masks
        )
        metrics = self.metrics.compute(flat_preds, flat_targets, flat_levels)

        if (
            self.config.visualize_predictions
            and is_main_process()
            and len(preds) > 0
        ):
            self._visualize_epoch_predictions(preds, targets, batches)
        return metrics

    def _visualize_epoch_predictions(
        self, preds: np.ndarray, targets: np.ndarray, batches: list[Any]
    ) -> None:
        n_vis = min(self.config.num_visualization_samples, len(preds))
        # Only materialize images from the leading batches actually shown
        # (concatenating the whole val split costs GBs at 512^2).
        image_batches: list[np.ndarray] = []
        collected = 0
        for b in batches:
            image_batches.append(np.asarray(b["image"]))
            collected += len(image_batches[-1])
            if collected >= n_vis:
                break
        images = np.concatenate(image_batches, axis=0)[:n_vis]
        metadata = [m for b in batches for m in b.get("metadata", [])][:n_vis]
        try:
            self.visualizer.plot_localization_predictions(
                [img for img in images for _ in range(NUM_LEVELS)],
                preds[:n_vis].reshape(-1, 2),
                targets[:n_vis].reshape(-1, 2),
                [
                    {**meta, "level": level_name}
                    for meta in metadata
                    for level_name in IDX_TO_LEVEL.values()
                ],
                filename=f"predictions_epoch_{self.current_epoch}",
            )
        except Exception as exc:  # viz must never kill training
            logger.warning("Prediction visualization failed: %s", exc)

    def on_train_begin(self) -> None:
        if self.config.freeze_backbone_epochs > 0:
            logger.info(
                "Backbone frozen for first %d epochs",
                self.config.freeze_backbone_epochs,
            )
        logger.info("Train dataset stats: %s", self.train_dataset.get_stats())

    def on_epoch_begin(self, epoch: int) -> None:
        if (
            not self._backbone_unfrozen
            and epoch >= self.config.freeze_backbone_epochs
        ):
            logger.info("Unfreezing backbone at epoch %d", epoch + 1)
            self.set_backbone_frozen(False)
            self._backbone_unfrozen = True

    def on_train_end(self, result: TrainingResult) -> None:
        import jax

        # Single-controller only: _collect_split runs SPMD eval steps that
        # every process would have to join — gating on is_main_process()
        # alone would hang process 0 at the first collective in a
        # multi-process run.
        if jax.process_count() == 1 and is_main_process():
            self._generate_final_visualizations()

    def get_metric_for_checkpoint(
        self, val_loss: float | None, metrics: dict[str, float]
    ) -> float:
        if "med" in metrics:
            return metrics["med"]
        if val_loss is not None:
            return val_loss
        return (
            self.history["train_loss"][-1]
            if self.history["train_loss"]
            else float("inf")
        )

    def _collect_split(
        self, dataset: LocalizationDataset
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Run eval forward over a dataset, return (preds, targets, masks)."""
        loader = DataLoader(
            dataset,
            batch_size=self.config.batch_size,
            shuffle=False,
            drop_last=False,
            seed=self.config.seed,
            collate_fn=collate_localization,
            num_workers=self.config.num_workers,
        )
        preds_list, targets_list, masks_list = [], [], []
        for batch in loader:
            device_batch, n_valid = self._shard_eval(batch)
            outputs, _ = self._eval_step(self.state, device_batch)
            batch = self._trim_batch(batch, n_valid)  # drop loader duplicates
            preds_list.append(self._slice_outputs(outputs, n_valid))
            targets_list.append(np.asarray(batch["coords"]))
            masks_list.append(np.asarray(batch["mask"]))
        return (
            np.concatenate(preds_list, axis=0),
            np.concatenate(targets_list, axis=0),
            np.concatenate(masks_list, axis=0),
        )

    def _generate_final_visualizations(self) -> None:
        try:
            self.visualizer.plot_training_curves(
                self.history, filename="training_curves"
            )
            if self.val_dataset is not None and len(self.val_dataset) > 0:
                preds, targets, masks = self._collect_split(self.val_dataset)
                flat_p, flat_t, flat_l = self._flatten_with_mask(
                    preds, targets, masks
                )
                self.visualizer.plot_error_distribution(
                    flat_p,
                    flat_t,
                    flat_l,
                    level_names=list(IDX_TO_LEVEL.values()),
                    filename="error_distribution",
                )
                final_metrics = self.metrics.compute(flat_p, flat_t, flat_l)
                self.visualizer.plot_per_level_metrics(
                    final_metrics,
                    level_names=list(IDX_TO_LEVEL.values()),
                    metric_prefix="med_",
                    filename="per_level_med",
                )
        except Exception as exc:
            logger.warning("Final visualization failed: %s", exc)
        logger.info("Visualizations saved to: %s", self.config.logs_path)

    def evaluate(
        self, test_dataset: LocalizationDataset | None = None
    ) -> dict[str, float]:
        """Evaluate on the test split (reference localization.py:469-533)."""
        import jax

        if jax.process_count() > 1:
            # Single-controller only — see ClassificationTrainer.evaluate.
            raise NotImplementedError(
                "evaluate() is single-controller only; load the checkpoint "
                "in a single-process session to compute test metrics"
            )
        if test_dataset is None:
            test_dataset = LocalizationDataset(
                data_path=self.config.data_path,
                split="test",
                val_ratio=self.config.val_split,
                series_types=self.config.series_types,
                sources=self.config.sources,
                image_size=self.config.image_size,
                augment=False,
                seed=self.config.seed,
            )
        if len(test_dataset) == 0:
            # A tiny dataset can round the test fraction down to zero
            # images; surface that instead of a bare concatenate error.
            logger.warning(
                "Test split is empty (dataset too small for the split "
                "ratios) — no evaluation metrics."
            )
            return {}
        preds, targets, masks = self._collect_split(test_dataset)
        flat_p, flat_t, flat_l = self._flatten_with_mask(preds, targets, masks)
        metrics = self.metrics.compute(flat_p, flat_t, flat_l)
        logger.info("Test Results:")
        for key, value in metrics.items():
            logger.info("  %s: %.4f", key, value)
        if self.tracker is not None:
            self.tracker.log_metrics({f"test/{k}": v for k, v in metrics.items()})
        return metrics
