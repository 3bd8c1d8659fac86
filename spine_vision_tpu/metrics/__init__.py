"""Host-side evaluation metrics: localization error (MED/MAE/PCK) and
multi-task classification aggregates (accuracy/P/R/F1/AUC).

Numerical parity with the reference's hand-rolled numpy metrics
(spine_vision/training/metrics.py:60-518), which are the actual hot path the
reference trainers use for checkpoint selection. These run on host numpy after
device evaluation; the expensive part (forward passes and cross-device
gathers) stays on device.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from spine_vision_tpu.core.registry import register_metrics

from spine_vision_tpu.core.tasks import AVAILABLE_TASK_NAMES, TaskConfig, get_task

LEVEL_NAMES_DEFAULT = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]


def _to_np(x: Any) -> np.ndarray:
    """Convert device arrays / lists to host numpy."""
    return np.asarray(x)


def _stable_sigmoid(x: np.ndarray) -> np.ndarray:
    """Overflow-free sigmoid (np.exp(-x) overflows for x < -709)."""
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def _softmax(x: np.ndarray) -> np.ndarray:
    """Row-wise stable softmax."""
    x = x.astype(np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    ex = np.exp(x)
    return ex / ex.sum(axis=-1, keepdims=True)


def roc_auc(scores: Any, labels: Any) -> float:
    """Binary ROC-AUC via the rank statistic (Mann-Whitney U), tie-aware.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos == score_neg),
    computed with average ranks so tied scores contribute 0.5. Returns NaN
    when only one class is present (AUC is undefined). The reference has no
    AUC metric anywhere; this exists because the rebuild's north star
    (BASELINE.json) requires grading-AUC parity to be measurable.
    """
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(int)
    n_pos = int(np.sum(labels == 1))
    n_neg = int(np.sum(labels == 0))
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    # Average (1-based) rank per score value: tied values share the mean of
    # the rank range they span.
    _, inverse, counts = np.unique(scores, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank_per_unique = cum - (counts - 1) / 2.0
    ranks = avg_rank_per_unique[inverse]
    u = float(np.sum(ranks[labels == 1])) - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def macro_ovr_auc(probabilities: Any, targets: Any) -> float:
    """Macro one-vs-rest ROC-AUC for multiclass probabilities [N, C].

    Classes absent from (or filling all of) ``targets`` are skipped — their
    one-vs-rest AUC is undefined. NaN when no class is scoreable.
    """
    probs = np.asarray(probabilities, dtype=np.float64)
    targets = np.asarray(targets).ravel().astype(int)
    aucs = []
    for class_idx in range(probs.shape[1]):
        ovr = (targets == class_idx).astype(int)
        if ovr.min() == ovr.max():
            continue
        aucs.append(roc_auc(probs[:, class_idx], ovr))
    return float(np.mean(aucs)) if aucs else float("nan")


def _precision_recall_f1(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return float(precision), float(recall), float(f1)


@dataclass
class MetricResult:
    """Container for metric computation results."""

    name: str
    value: float
    per_class: dict[str, float] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)


class BaseMetrics(ABC):
    """Abstract base class for metrics calculators."""

    @abstractmethod
    def compute(self, predictions: Any, targets: Any, **kwargs: Any) -> dict[str, float]:
        """Compute metrics from predictions and targets."""

    @abstractmethod
    def reset(self) -> None:
        """Reset accumulated state."""


@register_metrics("localization")
class LocalizationMetrics(BaseMetrics):
    """Metrics for coordinate localization.

    Computes MED (mean Euclidean distance) + std/median, per-coordinate MAE,
    PCK at thresholds (fraction of predictions within a normalized distance,
    in percent), and per-level MED breakdown. Parity with reference
    training/metrics.py:121-185.
    """

    def __init__(
        self,
        pck_thresholds: list[float] | None = None,
        level_names: list[str] | None = None,
    ) -> None:
        # `is None` (not falsy-or): an explicit [] means "no PCK columns" /
        # "no per-level rows", it must not re-enable the defaults.
        self.pck_thresholds = (
            pck_thresholds if pck_thresholds is not None else [0.02, 0.05, 0.10]
        )
        self.level_names = (
            level_names if level_names is not None else list(LEVEL_NAMES_DEFAULT)
        )
        self._predictions: list[np.ndarray] = []
        self._targets: list[np.ndarray] = []
        self._levels: list[np.ndarray] = []

    def reset(self) -> None:
        self._predictions = []
        self._targets = []
        self._levels = []

    def update(
        self,
        predictions: Any,
        targets: Any,
        levels: Any | None = None,
    ) -> None:
        """Accumulate a batch of [B, 2] predictions/targets (+ levels [B])."""
        self._predictions.append(_to_np(predictions))
        self._targets.append(_to_np(targets))
        if levels is not None:
            self._levels.append(_to_np(levels))

    def compute(
        self,
        predictions: Any | None = None,
        targets: Any | None = None,
        levels: Any | None = None,
        **kwargs: Any,
    ) -> dict[str, float]:
        """Compute all metrics from explicit arrays or accumulated state."""
        if predictions is None and self._predictions:
            predictions = np.concatenate(self._predictions, axis=0)
            targets = np.concatenate(self._targets, axis=0)
            if self._levels:
                levels = np.concatenate(self._levels, axis=0)

        if predictions is None or targets is None:
            return {}

        predictions = _to_np(predictions).astype(np.float64)
        targets = _to_np(targets).astype(np.float64)
        if len(predictions) == 0:
            # All keypoints masked out (or an empty split): {} matches the
            # no-data accumulated path — NaN here would silently freeze
            # best-checkpoint tracking (NaN < best is never True).
            return {}
        if levels is not None:
            levels = _to_np(levels)
            if len(levels) != len(predictions):
                # Mixed update() calls with and without levels: the
                # breakdown is no longer row-aligned — skip it rather than
                # index with a mismatched mask.
                levels = None

        metrics: dict[str, float] = {}

        distances = np.sqrt(np.sum((predictions - targets) ** 2, axis=1))
        metrics["med"] = float(np.mean(distances))
        metrics["med_std"] = float(np.std(distances))
        metrics["med_median"] = float(np.median(distances))

        mae = np.abs(predictions - targets)
        metrics["mae_x"] = float(np.mean(mae[:, 0]))
        metrics["mae_y"] = float(np.mean(mae[:, 1]))
        metrics["mae"] = float(np.mean(mae))

        for thresh in self.pck_thresholds:
            metrics[f"pck@{thresh:.2f}"] = float(np.mean(distances < thresh) * 100)

        if levels is not None:
            for level_idx, level_name in enumerate(self.level_names):
                mask = levels == level_idx
                if np.sum(mask) > 0:
                    metrics[f"med_{level_name}"] = float(np.mean(distances[mask]))

        return metrics

    def compute_detailed(
        self,
        predictions: Any,
        targets: Any,
        levels: Any | None = None,
    ) -> MetricResult:
        """Compute metrics with per-level breakdown packaged as MetricResult."""
        metrics = self.compute(predictions, targets, levels)
        per_class = {
            name: metrics[f"med_{name}"]
            for name in self.level_names
            if f"med_{name}" in metrics
        }
        return MetricResult(
            name="LocalizationMetrics",
            value=metrics.get("med", 0.0),
            per_class=per_class,
            metadata=metrics,
        )


@register_metrics("classification")
class ClassificationMetrics(BaseMetrics):
    """Per-task classification metrics: accuracy, per-class P/R/F1,
    balanced accuracy, macro F1 (reference training/metrics.py:263-318)."""

    def __init__(self, num_classes: int, class_names: list[str] | None = None) -> None:
        self.num_classes = num_classes
        self.class_names = class_names or [f"class_{i}" for i in range(num_classes)]
        self._predictions: list[np.ndarray] = []
        self._targets: list[np.ndarray] = []

    def reset(self) -> None:
        self._predictions = []
        self._targets = []

    def update(self, predictions: Any, targets: Any) -> None:
        """Accumulate [B] class predictions (argmaxed if [B, C]) and targets."""
        preds = _to_np(predictions)
        if preds.ndim > 1:
            preds = preds.argmax(axis=1)
        self._predictions.append(preds)
        self._targets.append(_to_np(targets))

    def compute(
        self,
        predictions: Any | None = None,
        targets: Any | None = None,
        **kwargs: Any,
    ) -> dict[str, float]:
        if predictions is None and self._predictions:
            predictions = np.concatenate(self._predictions, axis=0)
            targets = np.concatenate(self._targets, axis=0)

        if predictions is None or targets is None:
            return {}

        predictions = _to_np(predictions)
        if predictions.ndim > 1:
            predictions = predictions.argmax(axis=1)
        targets = _to_np(targets)

        metrics: dict[str, float] = {}
        metrics["accuracy"] = float(np.mean(predictions == targets) * 100)

        for class_idx, class_name in enumerate(self.class_names):
            pred_mask = predictions == class_idx
            target_mask = targets == class_idx

            precision, recall, f1 = _precision_recall_f1(
                np.sum(pred_mask & target_mask),
                np.sum(pred_mask & ~target_mask),
                np.sum(~pred_mask & target_mask),
            )
            metrics[f"precision_{class_name}"] = precision
            metrics[f"recall_{class_name}"] = recall
            metrics[f"f1_{class_name}"] = f1

        recalls = [metrics[f"recall_{name}"] for name in self.class_names]
        metrics["balanced_accuracy"] = float(np.mean(recalls) * 100)

        f1s = [metrics[f"f1_{name}"] for name in self.class_names]
        metrics["macro_f1"] = float(np.mean(f1s))

        return metrics


@register_metrics("classifier")
class ClassifierMetrics:
    """Multi-task metrics aggregator for the Classifier model.

    Per task: accuracy (+ balanced accuracy for multiclass; precision/recall/F1
    for binary) and ROC-AUC (one-vs-rest macro for multiclass) when the task's
    probabilities were seen and both classes occur. Aggregates:
    ``overall_accuracy`` = mean accuracy across tasks; ``f1`` for single-task
    setups, ``macro_f1`` across tasks otherwise (used for checkpoint
    selection); ``macro_auc`` = mean of the defined per-task AUCs. Parity with
    reference training/metrics.py:321-518 (which carries no AUC — the AUC rows
    exist for the rebuild's BASELINE.json grading-AUC-parity requirement).
    """

    def __init__(
        self,
        tasks: list[TaskConfig] | None = None,
        target_labels: list[str] | None = None,
    ) -> None:
        if target_labels is None:
            labels_to_track = list(AVAILABLE_TASK_NAMES)
        else:
            labels_to_track = list(target_labels)

        task_types: dict[str, str] = {}
        num_classes: dict[str, int] = {}
        if tasks is not None:
            for task in tasks:
                if task.name in labels_to_track:
                    task_types[task.name] = task.task_type
                    num_classes[task.name] = task.num_classes
        else:
            for label in labels_to_track:
                task = get_task(label)
                task_types[label] = task.task_type
                num_classes[label] = task.num_classes

        self._task_types = task_types

        self._multiclass_metrics: dict[str, ClassificationMetrics] = {}
        self._multiclass_probs: dict[str, list[np.ndarray]] = {}
        self._multiclass_targets: dict[str, list[np.ndarray]] = {}
        self._binary_preds: dict[str, list[np.ndarray]] = {}
        self._binary_targets: dict[str, list[np.ndarray]] = {}

        for label, task_type in task_types.items():
            if task_type == "multiclass":
                n = num_classes[label]
                self._multiclass_metrics[label] = ClassificationMetrics(
                    num_classes=n, class_names=[f"class_{i}" for i in range(n)]
                )
                self._multiclass_probs[label] = []
                self._multiclass_targets[label] = []
            elif task_type == "binary":
                self._binary_preds[label] = []
                self._binary_targets[label] = []

    def reset(self) -> None:
        for m in self._multiclass_metrics.values():
            m.reset()
        for label in self._multiclass_probs:
            self._multiclass_probs[label] = []
            self._multiclass_targets[label] = []
        for label in self._binary_preds:
            self._binary_preds[label] = []
            self._binary_targets[label] = []

    def update(self, predictions: Any, targets: Any) -> None:
        """Accumulate a batch. predictions/targets: dict (or attr-accessible)
        of per-task arrays; multiclass predictions are logits [B, C], binary
        predictions are logits [B, 1]."""

        def get_value(obj: Any, key: str) -> Any | None:
            if isinstance(obj, dict):
                return obj.get(key)
            return getattr(obj, key, None)

        for label, metrics in self._multiclass_metrics.items():
            pred = get_value(predictions, label)
            target = get_value(targets, label)
            if pred is not None and target is not None:
                logits = _to_np(pred)
                metrics.update(logits.argmax(axis=1), _to_np(target))
                # Keep probabilities for the OvR AUC (logits only — a caller
                # passing pre-argmaxed classes gets no AUC for this label).
                if logits.ndim > 1:
                    self._multiclass_probs[label].append(_softmax(logits))
                    self._multiclass_targets[label].append(_to_np(target))

        for label in self._binary_preds:
            pred = get_value(predictions, label)
            target = get_value(targets, label)
            if pred is not None and target is not None:
                logits = _to_np(pred).astype(np.float64)
                probs = _stable_sigmoid(logits)
                self._binary_preds[label].append(probs)
                self._binary_targets[label].append(_to_np(target))

    @property
    def is_single_task(self) -> bool:
        return len(self._task_types) == 1

    def compute(self) -> dict[str, float]:
        """Compute per-task and aggregate metrics."""
        metrics: dict[str, float] = {}
        f1_scores: list[float] = []
        auc_scores: list[float] = []

        for label, task_metrics in self._multiclass_metrics.items():
            computed = task_metrics.compute()
            if computed:
                metrics[f"{label}_accuracy"] = computed.get("accuracy", 0.0)
                metrics[f"{label}_balanced_acc"] = computed.get(
                    "balanced_accuracy", 0.0
                )
                f1_scores.append(computed.get("macro_f1", 0.0))
            if self._multiclass_probs.get(label):
                auc = macro_ovr_auc(
                    np.concatenate(self._multiclass_probs[label], axis=0),
                    np.concatenate(self._multiclass_targets[label], axis=0),
                )
                if not np.isnan(auc):
                    metrics[f"{label}_auc"] = auc
                    auc_scores.append(auc)

        for label, preds_list in self._binary_preds.items():
            if not preds_list:
                continue

            preds = np.concatenate(preds_list, axis=0).flatten()
            targets = np.concatenate(self._binary_targets[label], axis=0).flatten()

            pred_binary = (preds > 0.5).astype(int)
            t_binary = targets.astype(int)

            metrics[f"{label}_accuracy"] = float(
                np.mean(pred_binary == t_binary) * 100
            )

            precision, recall, f1 = _precision_recall_f1(
                np.sum((pred_binary == 1) & (t_binary == 1)),
                np.sum((pred_binary == 1) & (t_binary == 0)),
                np.sum((pred_binary == 0) & (t_binary == 1)),
            )
            metrics[f"{label}_precision"] = precision
            metrics[f"{label}_recall"] = recall
            metrics[f"{label}_f1"] = f1
            f1_scores.append(f1)

            auc = roc_auc(preds, t_binary)
            if not np.isnan(auc):
                metrics[f"{label}_auc"] = auc
                auc_scores.append(auc)

        accs = [v for k, v in metrics.items() if k.endswith("_accuracy")]
        metrics["overall_accuracy"] = float(np.mean(accs)) if accs else 0.0

        if f1_scores:
            if self.is_single_task:
                metrics["f1"] = float(f1_scores[0])
            else:
                metrics["macro_f1"] = float(np.mean(f1_scores))
        if auc_scores:
            # Mean over tasks whose AUC was defined (degenerate single-class
            # eval splits are skipped rather than poisoning the mean).
            metrics["macro_auc"] = float(np.mean(auc_scores))

        return metrics


__all__ = [
    "BaseMetrics",
    "ClassificationMetrics",
    "ClassifierMetrics",
    "LocalizationMetrics",
    "MetricResult",
    "macro_ovr_auc",
    "roc_auc",
]
