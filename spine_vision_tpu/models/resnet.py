"""Flax ResNet family backbones (ResNet / ResNeXt / WideResNet / ResNet-RS).

TPU-first design notes:
- NHWC layout (XLA's native conv layout on TPU).
- ``dtype`` controls compute precision (bf16 for MXU throughput); params stay
  float32 (``param_dtype``).
- BatchNorm keeps running stats in the ``batch_stats`` collection; pass
  ``axis_name`` to sync batch statistics across a data-parallel mesh axis
  (the reference relies on DDP's local BN, so syncing is optional).

Capability parity: the reference exposes ResNet-18/34/50/101/152, ResNeXt-50/
101, WideResNet-50/101, and ResNet-RS-50/101/152 through timm
(training/models/backbone.py:25-85). Here each is a config of the same module
family. ResNet-RS is approximated as ResNet-D stem + SE blocks (its defining
architectural features).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from spine_vision_tpu.ops.batchnorm import TpuBatchNorm
from spine_vision_tpu.ops.pool import max_pool

ModuleDef = Any


@dataclass(frozen=True)
class ResNetConfig:
    """Architecture hyperparameters for a ResNet-family backbone."""

    stage_sizes: tuple[int, ...]
    block_type: str  # "basic" | "bottleneck"
    width_factor: int = 1  # widens the bottleneck 3x3 (WideResNet)
    cardinality: int = 1  # grouped 3x3 conv (ResNeXt)
    base_width: int = 64  # per-group width base (ResNeXt uses 4*cardinality)
    deep_stem: bool = False  # ResNet-D / RS three-conv stem
    use_se: bool = False  # squeeze-excitation (ResNet-RS)
    num_features: int = 512  # output feature dim (512 basic / 2048 bottleneck)


RESNET_CONFIGS: dict[str, ResNetConfig] = {
    "resnet18": ResNetConfig((2, 2, 2, 2), "basic", num_features=512),
    "resnet34": ResNetConfig((3, 4, 6, 3), "basic", num_features=512),
    "resnet50": ResNetConfig((3, 4, 6, 3), "bottleneck", num_features=2048),
    "resnet101": ResNetConfig((3, 4, 23, 3), "bottleneck", num_features=2048),
    "resnet152": ResNetConfig((3, 8, 36, 3), "bottleneck", num_features=2048),
    "resnext50": ResNetConfig(
        (3, 4, 6, 3), "bottleneck", cardinality=32, base_width=4, num_features=2048
    ),
    "resnext101": ResNetConfig(
        (3, 4, 23, 3), "bottleneck", cardinality=32, base_width=8, num_features=2048
    ),
    "wide_resnet50": ResNetConfig(
        (3, 4, 6, 3), "bottleneck", width_factor=2, num_features=2048
    ),
    "wide_resnet101": ResNetConfig(
        (3, 4, 23, 3), "bottleneck", width_factor=2, num_features=2048
    ),
    "resnetrs50": ResNetConfig(
        (3, 4, 6, 3), "bottleneck", deep_stem=True, use_se=True, num_features=2048
    ),
    "resnetrs101": ResNetConfig(
        (3, 4, 23, 3), "bottleneck", deep_stem=True, use_se=True, num_features=2048
    ),
    "resnetrs152": ResNetConfig(
        (3, 8, 36, 3), "bottleneck", deep_stem=True, use_se=True, num_features=2048
    ),
}


class SqueezeExcite(nn.Module):
    """Squeeze-and-excitation channel attention.

    Defaults match the ResNet-RS SE convention (relu + sigmoid,
    ``channels // reduction`` floored at 8). EfficientNet/MobileNetV3
    callers pass explicit ``hidden``/``act``/``gate`` to match timm's SE
    sizing and activations exactly (their checkpoints convert 1:1 —
    reference training/models/backbone.py:143-177 consumes timm)."""

    reduction: int = 16
    hidden: int | None = None  # explicit squeeze width (overrides reduction)
    act: str = "relu"  # "relu" | "silu"
    gate: str = "sigmoid"  # "sigmoid" | "hard_sigmoid"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        channels = x.shape[-1]
        squeezed = jnp.mean(x, axis=(1, 2))
        hidden = (
            self.hidden
            if self.hidden is not None
            else max(channels // self.reduction, 8)
        )
        s = nn.Dense(hidden, dtype=self.dtype, name="fc1")(squeezed)
        s = nn.silu(s) if self.act == "silu" else nn.relu(s)
        s = nn.Dense(channels, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.hard_sigmoid(s) if self.gate == "hard_sigmoid" else nn.sigmoid(s)
        return x * s[:, None, None, :]


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (ResNet-18/34)."""

    filters: int
    strides: int
    norm: ModuleDef
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = self.norm(name="bn2", scale_init=nn.initializers.zeros_init())(y)
        if self.use_se:
            y = SqueezeExcite(dtype=self.dtype, name="se")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    """1x1-3x3-1x1 bottleneck block with optional groups/width/SE."""

    filters: int  # inner (3x3) width
    strides: int
    norm: ModuleDef
    groups: int = 1
    use_se: bool = False
    dtype: Any = jnp.float32
    base_out: int = 256  # output width (stage base * 4)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        out_features = self.base_out
        y = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides),
            padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = self.norm(name="bn3", scale_init=nn.initializers.zeros_init())(y)
        if self.use_se:
            y = SqueezeExcite(dtype=self.dtype, name="se")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                out_features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet-family feature extractor: images -> pooled features.

    Returns [B, num_features] globally average-pooled features (the backbone
    contract the reference gets from ``timm.create_model(num_classes=0)``).
    """

    config: ResNetConfig
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # Implementation toggles, defaults set by the round-5 on-chip bisect
    # (BASELINE.md): TpuBatchNorm is perf-neutral-or-better than
    # nn.BatchNorm (full train step 6233 vs 6201 img/s b256) and keeps
    # every full-size pass bf16; the scatter-free pool LOSES 4.6x to
    # nn.max_pool's select_and_scatter in training (raw fwd+bwd 1882 vs
    # 8652 img/s — the round-4 regression), so "flax" is the pool default.
    # Both pairs register the same variables; checkpoints interchange.
    norm_impl: str = "tpu"
    pool_impl: str = "flax"

    def _pool(self, x: Array) -> Array:
        """Stem 3x3/2 max pool in the configured implementation."""
        if self.pool_impl == "tpu":
            # Scatter-free pool: measured 4.6x SLOWER in training than
            # select_and_scatter (round-5 bisect) — kept only as the A/B
            # toggle; see ops/pool.py.
            return max_pool(x, (3, 3), strides=(2, 2), padding=(1, 1))
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        # TpuBatchNorm: same variables/statistics as nn.BatchNorm but every
        # full-size pass is one fused bf16 read/write (ops/batchnorm.py).
        # Measured effect is modest (round-5 bisect: full train step 6233
        # vs 6201 img/s b256 — XLA already fuses most of flax BN's f32
        # upcasts); kept as default for the bf16 residuals (less HBM).
        norm_cls = TpuBatchNorm if self.norm_impl == "tpu" else nn.BatchNorm
        norm = partial(
            norm_cls,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )

        x = x.astype(self.dtype)
        if cfg.deep_stem:
            for i, f in enumerate((32, 32, 64)):
                x = nn.Conv(
                    f, (3, 3), (2, 2) if i == 0 else (1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name=f"stem_conv{i + 1}",
                )(x)
                x = norm(name=f"stem_bn{i + 1}")(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(
                64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="stem_conv",
            )(x)
            x = norm(name="stem_bn")(x)
            # Pool BEFORE the stem ReLU: relu(max_pool(x)) ==
            # max_pool(relu(x)) exactly (relu is monotonic and both pool
            # impls pad with -inf, which never wins a max). The ReLU then
            # touches the pooled tensor (4x smaller); measured NEUTRAL on
            # chip (6179/6343 img/s b256/b512 contended vs 6233 quiet,
            # BASELINE.md roofline row) — XLA already fused the relu. Kept:
            # never more bytes, and exact.
            x = self._pool(x)
            x = nn.relu(x)
        if cfg.deep_stem:
            x = self._pool(x)

        for stage_idx, num_blocks in enumerate(cfg.stage_sizes):
            base = 64 * (2**stage_idx)
            for block_idx in range(num_blocks):
                strides = 2 if stage_idx > 0 and block_idx == 0 else 1
                name = f"stage{stage_idx + 1}_block{block_idx + 1}"
                if cfg.block_type == "basic":
                    x = BasicBlock(
                        filters=base * cfg.width_factor,
                        strides=strides,
                        norm=norm,
                        use_se=cfg.use_se,
                        dtype=self.dtype,
                        name=name,
                    )(x)
                else:
                    if cfg.cardinality > 1:
                        inner = int(base * cfg.base_width / 64.0) * cfg.cardinality
                    else:
                        inner = base * cfg.width_factor
                    x = BottleneckBlock(
                        filters=inner,
                        strides=strides,
                        norm=norm,
                        groups=cfg.cardinality,
                        use_se=cfg.use_se,
                        dtype=self.dtype,
                        base_out=base * 4,
                        name=name,
                    )(x)

        # Global average pool -> [B, C] features in float32 for head stability.
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
