"""Multi-task Classifier and CoordinateRegressor (Flax).

Capability parity with reference training/models/generic.py:48-497, designed
the JAX way: modules are pure apply functions; the multi-task loss is a pure
function assembled from task strategies (closed over inside jitted train
steps) rather than module state.

- :class:`Classifier`: backbone -> GAP features -> dropout -> one Dense per
  task -> {task: logits}.
- :class:`CoordinateRegressor`: backbone -> LayerNorm/Dropout/Dense(256)/GELU/
  Dropout/Dense(L*2)/sigmoid -> [B, L, 2] normalized coordinates.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from spine_vision_tpu.core.tasks import TaskConfig, create_loss_functions, get_strategy, get_tasks
from spine_vision_tpu.core.registry import register_model
from spine_vision_tpu.models.backbone import BackboneFactory
from spine_vision_tpu.models.heads import HeadConfig, create_head
from spine_vision_tpu.ops.losses import masked_coordinate_loss


@register_model("classifier")
class Classifier(nn.Module):
    """Generic classifier with configurable backbone and per-task heads.

    Apply signature:
        variables, x [B, H, W, 3] float, train: bool
        -> {task_name: logits [B, num_classes]}

    Mutable collections: ``batch_stats`` when the backbone uses BatchNorm;
    dropout needs an rng under ``train=True``.
    """

    backbone_name: str = "resnet50"
    tasks: tuple[TaskConfig, ...] = ()
    dropout: float = 0.3
    dtype: Any = jnp.bfloat16
    axis_name: str | None = None
    use_pallas: bool | str = False  # ConvNeXt kernels: True | "mlp" | "hybrid"
    norm_impl: str = "tpu"  # ResNet family: "tpu" fused BN | "flax" nn.BatchNorm
    pool_impl: str = "flax"  # ResNet family: "flax" nn.max_pool (round-5 bisect) | "tpu"

    def setup(self) -> None:
        tasks = self.tasks or tuple(get_tasks())
        self._task_list = tasks
        self.backbone, self.feature_dim = BackboneFactory.create(
            self.backbone_name,
            dtype=self.dtype,
            axis_name=self.axis_name,
            use_pallas=self.use_pallas,
            norm_impl=self.norm_impl,
            pool_impl=self.pool_impl,
        )
        self.dropout_layer = nn.Dropout(self.dropout)
        self.heads = {
            task.name: nn.Dense(task.num_classes, name=f"head_{task.name}")
            for task in tasks
        }

    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        features = self.backbone(x, train=train)
        features = self.dropout_layer(features, deterministic=not train)
        return {name: head(features) for name, head in self.heads.items()}

    def get_features(self, x: Array, train: bool = False) -> Array:
        return self.backbone(x, train=train)

    @property
    def task_names(self) -> list[str]:
        return [t.name for t in (self.tasks or tuple(get_tasks()))]


def make_multitask_loss_fn(
    tasks: list[TaskConfig] | tuple[TaskConfig, ...],
) -> Callable[[dict[str, Array], dict[str, Array]], Array]:
    """Build the weighted multi-task loss: sum_i w_i * loss_i.

    Pure-function equivalent of reference Classifier.get_loss
    (generic.py:147-177); targets are strategy-formatted inside.

    The returned function takes an optional ``sample_weight`` [B] array:
    when given, each task's loss is a weighted mean over per-sample losses
    (used to exclude padded rows from eval batches exactly; tasks with a
    custom_loss_fn fall back to the unweighted mean).
    """
    tasks = list(tasks)
    loss_fns, loss_weights = create_loss_functions(tasks)
    strategies = {t.name: get_strategy(t) for t in tasks}
    per_sample_fns = {
        t.name: strategies[t.name].per_sample_loss_fn(t) for t in tasks
    }

    def loss_fn(
        predictions: dict[str, Array],
        targets: dict[str, Array],
        sample_weight: Array | None = None,
    ) -> Array:
        total = jnp.float32(0.0)
        for task in tasks:
            name = task.name
            if name not in predictions or name not in targets:
                continue
            target = strategies[name].format_target(targets[name])
            ps_fn = per_sample_fns[name]
            if sample_weight is not None and ps_fn is not None:
                w = sample_weight.astype(jnp.float32)
                per_sample = ps_fn(predictions[name], target)
                task_loss = jnp.sum(per_sample * w) / jnp.maximum(
                    jnp.sum(w), 1.0
                )
            else:
                task_loss = loss_fns[name](predictions[name], target)
            total = total + loss_weights[name] * task_loss
        return total

    return loss_fn


def make_multitask_loss_breakdown_fn(
    tasks: list[TaskConfig] | tuple[TaskConfig, ...],
) -> Callable[[dict[str, Array], dict[str, Array]], dict[str, Array]]:
    """Per-task loss values (reference generic.py:179-195)."""
    tasks = list(tasks)
    loss_fns, _ = create_loss_functions(tasks)
    strategies = {t.name: get_strategy(t) for t in tasks}

    def breakdown(
        predictions: dict[str, Array], targets: dict[str, Array]
    ) -> dict[str, Array]:
        out: dict[str, Array] = {}
        for task in tasks:
            name = task.name
            if name not in predictions or name not in targets:
                continue
            target = strategies[name].format_target(targets[name])
            out[name] = loss_fns[name](predictions[name], target)
        return out

    return breakdown


@register_model("coordinate_regressor")
class CoordinateRegressor(nn.Module):
    """Coordinate regressor: backbone + sigmoid head -> [B, num_levels, 2].

    Head architecture matches the reference default
    (generic.py:343-351): LayerNorm -> Dropout(p) -> Dense(256) -> GELU ->
    Dropout(p/2) -> Dense(num_levels * num_outputs) -> sigmoid. A custom
    HeadConfig may replace it.
    """

    backbone_name: str = "convnext_base"
    num_outputs: int = 2
    num_levels: int = 5
    dropout: float = 0.2
    head_config: HeadConfig | None = None
    dtype: Any = jnp.bfloat16
    axis_name: str | None = None
    use_pallas: bool | str = False  # ConvNeXt kernels: True | "mlp" | "hybrid"
    norm_impl: str = "tpu"  # ResNet family: "tpu" fused BN | "flax" nn.BatchNorm
    pool_impl: str = "flax"  # ResNet family: "flax" nn.max_pool (round-5 bisect) | "tpu"

    def setup(self) -> None:
        self.backbone, self.feature_dim = BackboneFactory.create(
            self.backbone_name,
            dtype=self.dtype,
            axis_name=self.axis_name,
            use_pallas=self.use_pallas,
            norm_impl=self.norm_impl,
            pool_impl=self.pool_impl,
        )
        total_outputs = self.num_levels * self.num_outputs
        if self.head_config is not None:
            self.head = create_head(self.head_config, total_outputs, self.dtype)
            self._custom_head = True
        else:
            self.head_norm = nn.LayerNorm(dtype=jnp.float32)
            self.head_drop1 = nn.Dropout(self.dropout)
            self.head_fc1 = nn.Dense(256)
            self.head_drop2 = nn.Dropout(self.dropout / 2)
            self.head_fc2 = nn.Dense(total_outputs)
            self._custom_head = False

    def __call__(self, x: Array, train: bool = False) -> Array:
        features = self.backbone(x, train=train)
        if self._custom_head:
            out = self.head(features, train=train)
        else:
            y = self.head_norm(features)
            y = self.head_drop1(y, deterministic=not train)
            y = self.head_fc1(y)
            y = nn.gelu(y, approximate=False)
            y = self.head_drop2(y, deterministic=not train)
            y = self.head_fc2(y)
            out = nn.sigmoid(y)
        return out.reshape(-1, self.num_levels, self.num_outputs)

    def get_features(self, x: Array, train: bool = False) -> Array:
        return self.backbone(x, train=train)


def make_coordinate_loss_fn(
    loss_type: str = "smooth_l1",
) -> Callable[[Array, Array, Array | None], Array]:
    """Masked coordinate loss factory (reference generic.py:393-417)."""

    def loss_fn(
        predictions: Array, targets: Array, mask: Array | None = None
    ) -> Array:
        return masked_coordinate_loss(predictions, targets, mask, loss_type)

    return loss_fn


def coords_to_pixels(coords: Array, image_size: tuple[int, int]) -> Array:
    """Normalized [0,1] coordinates -> pixel coordinates for (H, W) images."""
    h, w = image_size
    return coords * jnp.asarray([w, h], dtype=coords.dtype)
