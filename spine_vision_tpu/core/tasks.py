"""Task registry + per-type strategy objects for the grading heads.

Single source of truth for the eight lumbar-spine grading tasks and their
type-specific behavior (loss, predictions, probabilities, target formatting).
Capability parity with reference spine_vision/core/tasks.py:34-595, redesigned
for JAX: strategies hand out *pure functions* (jnp in / jnp out) instead of
``nn.Module`` loss objects, so they can be closed over inside jitted train
steps.

Usage:
    from spine_vision_tpu.core.tasks import TASK_REGISTRY, get_task, get_strategy

    task = get_task("pfirrmann")
    strategy = get_strategy(task)
    loss_fn = strategy.loss_fn(task)          # (logits, targets) -> [B] loss
    preds = strategy.compute_predictions(logits)
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.ops import losses as L

TaskType = Literal["binary", "multiclass", "multilabel", "ordinal", "regression"]

LossFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclass(frozen=True)
class TaskConfig:
    """Configuration for a classification task.

    Immutable; use :meth:`with_overrides` to derive training-time variants
    (reference core/tasks.py:86-99).

    Attributes:
        name: Task identifier (e.g. "pfirrmann").
        num_classes: Number of output classes (1 for binary).
        task_type: One of binary/multiclass/multilabel/ordinal/regression.
        display_name: Human-readable name (auto-derived from name if empty).
        class_names: Per-class names (auto "Class i" for multiclass).
        color: Hex color for visualization.
        label_smoothing: CE label smoothing (multiclass/ordinal).
        use_focal_loss: Use focal loss for binary/multilabel.
        focal_gamma / focal_alpha: Focal loss parameters.
        loss_weight: Weight of this task in the multi-task loss sum.
        custom_loss_fn: Escape hatch: () -> LossFn.
    """

    name: str
    num_classes: int
    task_type: TaskType
    display_name: str = ""
    class_names: tuple[str, ...] = ()
    color: str = "#1f77b4"

    label_smoothing: float = 0.0
    use_focal_loss: bool = False
    focal_gamma: float = 2.0
    focal_alpha: float | None = None
    loss_weight: float = 1.0

    custom_loss_fn: Callable[[], LossFn] | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        if not self.display_name:
            object.__setattr__(
                self, "display_name", self.name.replace("_", " ").title()
            )
        if not self.class_names and self.task_type == "multiclass":
            names = tuple(f"Class {i}" for i in range(self.num_classes))
            object.__setattr__(self, "class_names", names)

    def with_overrides(self, **kwargs: Any) -> "TaskConfig":
        """Create a new TaskConfig with overridden values."""
        return replace(self, **kwargs)

    @property
    def is_binary(self) -> bool:
        return self.task_type == "binary"

    @property
    def is_multiclass(self) -> bool:
        return self.task_type == "multiclass"


class TaskStrategy(ABC):
    """Strategy interface for task-type-specific behavior.

    Unlike the reference (which returns torch Modules / torchmetrics
    collections), each method returns either a pure function or computes
    directly on arrays, keeping everything jit-friendly.
    """

    @abstractmethod
    def loss_fn(self, task: TaskConfig) -> LossFn:
        """Return a pure loss function ``(logits, formatted_targets) -> scalar``."""

    def per_sample_loss_fn(self, task: TaskConfig) -> LossFn | None:
        """Return a ``(logits, formatted_targets) -> [B]`` per-sample loss,
        or None when unavailable (e.g. custom_loss_fn). Used for weighted
        batch reductions (padded eval batches, sample weighting)."""
        return None

    @abstractmethod
    def compute_predictions(self, logits: Any) -> np.ndarray:
        """Convert logits to discrete predictions (host numpy)."""

    @abstractmethod
    def compute_probabilities(self, logits: Any) -> np.ndarray:
        """Convert logits to probabilities (host numpy)."""

    @abstractmethod
    def format_target(self, target: Any) -> jax.Array:
        """Format a target array for the loss (dtype/shape normalization)."""

    @abstractmethod
    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        """Names of the metrics computed for this task type."""


def _as_np(x: Any) -> np.ndarray:
    return np.asarray(jax.device_get(x) if isinstance(x, jax.Array) else x)


class BinaryStrategy(TaskStrategy):
    """Binary classification: BCE-with-logits (or focal), sigmoid > 0.5."""

    def loss_fn(self, task: TaskConfig) -> LossFn:
        if task.custom_loss_fn is not None:
            return task.custom_loss_fn()
        if task.use_focal_loss:
            gamma, alpha = task.focal_gamma, task.focal_alpha

            def focal(logits: jax.Array, targets: jax.Array) -> jax.Array:
                return L.focal_loss_with_logits(
                    logits, targets, gamma=gamma, alpha=alpha, reduction="mean"
                )

            return focal

        def bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
            return jnp.mean(L.binary_cross_entropy_with_logits(logits, targets))

        return bce

    def per_sample_loss_fn(self, task: TaskConfig) -> LossFn | None:
        if task.custom_loss_fn is not None:
            return None
        if task.use_focal_loss:
            gamma, alpha = task.focal_gamma, task.focal_alpha

            def focal_ps(logits: jax.Array, targets: jax.Array) -> jax.Array:
                elem = L.focal_loss_with_logits(
                    logits, targets, gamma=gamma, alpha=alpha, reduction="none"
                )
                return jnp.mean(elem.reshape(elem.shape[0], -1), axis=1)

            return focal_ps

        def bce_ps(logits: jax.Array, targets: jax.Array) -> jax.Array:
            elem = L.binary_cross_entropy_with_logits(logits, targets)
            return jnp.mean(elem.reshape(elem.shape[0], -1), axis=1)

        return bce_ps

    def compute_predictions(self, logits: Any) -> np.ndarray:
        probs = 1.0 / (1.0 + np.exp(-_as_np(logits).astype(np.float64)))
        preds = (probs > 0.5).astype(np.int32)
        if preds.shape and preds.shape[-1] == 1:
            preds = preds.squeeze(-1)
        return preds

    def compute_probabilities(self, logits: Any) -> np.ndarray:
        x = _as_np(logits).astype(np.float64)
        return (1.0 / (1.0 + np.exp(-x))).astype(np.float32)

    def format_target(self, target: Any) -> jax.Array:
        t = jnp.asarray(target, dtype=jnp.float32)
        if t.ndim == 1:
            t = t[:, None]
        return t

    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        return ("accuracy", "precision", "recall", "f1")


class MulticlassStrategy(TaskStrategy):
    """Multiclass classification: CE with label smoothing, argmax."""

    def loss_fn(self, task: TaskConfig) -> LossFn:
        if task.custom_loss_fn is not None:
            return task.custom_loss_fn()
        smoothing = task.label_smoothing

        def ce(logits: jax.Array, targets: jax.Array) -> jax.Array:
            return jnp.mean(
                L.softmax_cross_entropy(logits, targets, label_smoothing=smoothing)
            )

        return ce

    def per_sample_loss_fn(self, task: TaskConfig) -> LossFn | None:
        if task.custom_loss_fn is not None:
            return None
        smoothing = task.label_smoothing

        def ce_ps(logits: jax.Array, targets: jax.Array) -> jax.Array:
            return L.softmax_cross_entropy(
                logits, targets, label_smoothing=smoothing
            )

        return ce_ps

    def compute_predictions(self, logits: Any) -> np.ndarray:
        return np.argmax(_as_np(logits), axis=1)

    def compute_probabilities(self, logits: Any) -> np.ndarray:
        x = _as_np(logits).astype(np.float64)
        x = x - x.max(axis=1, keepdims=True)
        e = np.exp(x)
        return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)

    def format_target(self, target: Any) -> jax.Array:
        return jnp.asarray(target, dtype=jnp.int32)

    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        return ("accuracy", "balanced_accuracy", "macro_f1")


class MultilabelStrategy(BinaryStrategy):
    """Multilabel classification: per-label BCE (or focal), sigmoid > 0.5."""

    def compute_predictions(self, logits: Any) -> np.ndarray:
        probs = 1.0 / (1.0 + np.exp(-_as_np(logits).astype(np.float64)))
        return (probs > 0.5).astype(np.int32)

    def format_target(self, target: Any) -> jax.Array:
        return jnp.asarray(target, dtype=jnp.float32)

    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        return ("accuracy", "f1")


class OrdinalStrategy(MulticlassStrategy):
    """Ordinal classification; CE baseline (extensible to CORAL-style)."""

    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        return ("accuracy", "mae", "macro_f1")


class RegressionStrategy(TaskStrategy):
    """Regression: MSE loss, identity predictions."""

    def loss_fn(self, task: TaskConfig) -> LossFn:
        if task.custom_loss_fn is not None:
            return task.custom_loss_fn()

        def mse(logits: jax.Array, targets: jax.Array) -> jax.Array:
            return jnp.mean(L.mse_loss(logits, targets))

        return mse

    def per_sample_loss_fn(self, task: TaskConfig) -> LossFn | None:
        if task.custom_loss_fn is not None:
            return None

        def mse_ps(logits: jax.Array, targets: jax.Array) -> jax.Array:
            elem = L.mse_loss(logits, targets)
            return jnp.mean(elem.reshape(elem.shape[0], -1), axis=1)

        return mse_ps

    def compute_predictions(self, logits: Any) -> np.ndarray:
        return _as_np(logits)

    def compute_probabilities(self, logits: Any) -> np.ndarray:
        return _as_np(logits)

    def format_target(self, target: Any) -> jax.Array:
        return jnp.asarray(target, dtype=jnp.float32)

    def metric_names(self, task: TaskConfig) -> tuple[str, ...]:
        return ("mse", "mae")


_STRATEGIES: dict[TaskType, TaskStrategy] = {
    "binary": BinaryStrategy(),
    "multiclass": MulticlassStrategy(),
    "multilabel": MultilabelStrategy(),
    "ordinal": OrdinalStrategy(),
    "regression": RegressionStrategy(),
}


def get_strategy(task: TaskConfig | TaskType) -> TaskStrategy:
    """Get the strategy for a task or task type string."""
    task_type = task.task_type if isinstance(task, TaskConfig) else task
    if task_type not in _STRATEGIES:
        raise ValueError(f"Unknown task type: {task_type}")
    return _STRATEGIES[task_type]


# =============================================================================
# Task Registry - the eight lumbar-spine tasks (reference core/tasks.py:368-427)
# =============================================================================

TASK_REGISTRY: dict[str, TaskConfig] = {
    "pfirrmann": TaskConfig(
        name="pfirrmann",
        num_classes=5,
        task_type="multiclass",
        display_name="Pfirrmann Grade",
        class_names=("Grade I", "Grade II", "Grade III", "Grade IV", "Grade V"),
        color="#1f77b4",
    ),
    "modic": TaskConfig(
        name="modic",
        num_classes=4,
        task_type="multiclass",
        display_name="Modic Type",
        class_names=("Normal", "Type I", "Type II", "Type III"),
        color="#ff7f0e",
    ),
    "herniation": TaskConfig(
        name="herniation",
        num_classes=1,
        task_type="binary",
        display_name="Disc Herniation",
        color="#2ca02c",
    ),
    "bulging": TaskConfig(
        name="bulging",
        num_classes=1,
        task_type="binary",
        display_name="Disc Bulging",
        color="#d62728",
    ),
    "upper_endplate": TaskConfig(
        name="upper_endplate",
        num_classes=1,
        task_type="binary",
        display_name="Upper Endplate Defect",
        color="#9467bd",
    ),
    "lower_endplate": TaskConfig(
        name="lower_endplate",
        num_classes=1,
        task_type="binary",
        display_name="Lower Endplate Defect",
        color="#8c564b",
    ),
    "spondy": TaskConfig(
        name="spondy",
        num_classes=1,
        task_type="binary",
        display_name="Spondylolisthesis",
        color="#e377c2",
    ),
    "narrowing": TaskConfig(
        name="narrowing",
        num_classes=1,
        task_type="binary",
        display_name="Disc Narrowing",
        color="#7f7f7f",
    ),
}

AVAILABLE_TASK_NAMES: tuple[str, ...] = tuple(TASK_REGISTRY.keys())


def get_task(name: str) -> TaskConfig:
    """Get a task configuration by name."""
    if name not in TASK_REGISTRY:
        raise KeyError(
            f"Unknown task: {name}. Available: {list(TASK_REGISTRY.keys())}"
        )
    return TASK_REGISTRY[name]


def get_tasks(names: list[str] | None = None) -> list[TaskConfig]:
    """Get multiple task configurations (all registered if names is None)."""
    if names is None:
        return list(TASK_REGISTRY.values())
    return [get_task(name) for name in names]


def register_task(task: TaskConfig) -> None:
    """Register a new task configuration."""
    if task.name in TASK_REGISTRY:
        raise ValueError(f"Task '{task.name}' already registered")
    TASK_REGISTRY[task.name] = task


# =============================================================================
# Helpers
# =============================================================================


def create_loss_functions(
    tasks: list[TaskConfig],
) -> tuple[dict[str, LossFn], dict[str, float]]:
    """Create loss functions and weights for multiple tasks.

    Returns pure functions (jit-safe) keyed by task name, plus loss weights
    (reference core/tasks.py:483-502).
    """
    loss_fns: dict[str, LossFn] = {}
    loss_weights: dict[str, float] = {}
    for task in tasks:
        strategy = get_strategy(task)
        loss_fns[task.name] = strategy.loss_fn(task)
        loss_weights[task.name] = task.loss_weight
    return loss_fns, loss_weights


def compute_predictions_for_tasks(
    outputs: dict[str, Any],
    tasks: list[TaskConfig],
) -> dict[str, np.ndarray]:
    """Compute discrete predictions for each task's logits."""
    predictions: dict[str, np.ndarray] = {}
    for task in tasks:
        if task.name not in outputs:
            continue
        strategy = get_strategy(task)
        predictions[task.name] = strategy.compute_predictions(outputs[task.name])
    return predictions


def compute_probabilities_for_tasks(
    outputs: dict[str, Any],
    tasks: list[TaskConfig],
) -> dict[str, np.ndarray]:
    """Compute probabilities for each task's logits."""
    probabilities: dict[str, np.ndarray] = {}
    for task in tasks:
        if task.name not in outputs:
            continue
        strategy = get_strategy(task)
        probabilities[task.name] = strategy.compute_probabilities(
            outputs[task.name]
        )
    return probabilities


def get_task_display_name(name: str) -> str:
    """Display name for a task (name itself if unregistered)."""
    if name in TASK_REGISTRY:
        return TASK_REGISTRY[name].display_name
    return name


def get_task_color(name: str) -> str:
    """Color for a task (default gray if unregistered)."""
    if name in TASK_REGISTRY:
        return TASK_REGISTRY[name].color
    return "#333333"


def get_task_display_names() -> dict[str, str]:
    """Display names for all registered tasks."""
    return {name: task.display_name for name, task in TASK_REGISTRY.items()}


def get_task_colors() -> dict[str, str]:
    """Colors for all registered tasks."""
    return {name: task.color for name, task in TASK_REGISTRY.items()}
