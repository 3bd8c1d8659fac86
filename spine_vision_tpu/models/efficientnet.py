"""Flax EfficientNet v1/v2 and MobileNetV3 backbones.

Reference parity surface: efficientnet_b0..b4, efficientnetv2_s/m/l,
mobilenetv3_small/large (training/models/backbone.py:751-762).

TPU-first notes: inverted-residual (MBConv) expansion 1x1 convs are MXU
matmuls; depthwise 3x3/5x5 run on the VPU. v2's FusedMBConv replaces
expand+depthwise with one dense 3x3 conv in early stages (better MXU
utilization at high resolution — the same reason it helps on TPU as in the
original paper). BatchNorm supports a mesh ``axis_name`` for synced stats.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from spine_vision_tpu.ops.batchnorm import TpuBatchNorm

from spine_vision_tpu.models.resnet import SqueezeExcite


@dataclass(frozen=True)
class BlockSpec:
    """One stage of inverted-residual blocks."""

    kind: str  # "mbconv" | "fused" | "dsconv"
    expand: float
    filters: int
    num_blocks: int
    kernel: int
    strides: int
    se_ratio: float = 0.0
    activation: str = "silu"  # "silu" | "hswish" | "relu"


@dataclass(frozen=True)
class EfficientNetConfig:
    """Scaled EfficientNet architecture."""

    blocks: tuple[BlockSpec, ...]
    stem_filters: int
    head_filters: int

    @property
    def num_features(self) -> int:
        return self.head_filters


def _scale_filters(filters: int, multiplier: float, divisor: int = 8) -> int:
    filters *= multiplier
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _scale_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(multiplier * repeats))


def _effnet_v1(width: float, depth: float) -> EfficientNetConfig:
    base = [
        BlockSpec("dsconv", 1, 16, 1, 3, 1, 0.25),
        BlockSpec("mbconv", 6, 24, 2, 3, 2, 0.25),
        BlockSpec("mbconv", 6, 40, 2, 5, 2, 0.25),
        BlockSpec("mbconv", 6, 80, 3, 3, 2, 0.25),
        BlockSpec("mbconv", 6, 112, 3, 5, 1, 0.25),
        BlockSpec("mbconv", 6, 192, 4, 5, 2, 0.25),
        BlockSpec("mbconv", 6, 320, 1, 3, 1, 0.25),
    ]
    blocks = tuple(
        BlockSpec(
            b.kind,
            b.expand,
            _scale_filters(b.filters, width),
            _scale_repeats(b.num_blocks, depth),
            b.kernel,
            b.strides,
            b.se_ratio,
        )
        for b in base
    )
    return EfficientNetConfig(
        blocks=blocks,
        stem_filters=_scale_filters(32, width),
        head_filters=_scale_filters(1280, max(width, 1.0)),
    )


EFFICIENTNET_CONFIGS: dict[str, EfficientNetConfig] = {
    "efficientnet_b0": _effnet_v1(1.0, 1.0),
    "efficientnet_b1": _effnet_v1(1.0, 1.1),
    "efficientnet_b2": _effnet_v1(1.1, 1.2),
    "efficientnet_b3": _effnet_v1(1.2, 1.4),
    "efficientnet_b4": _effnet_v1(1.4, 1.8),
    "efficientnetv2_s": EfficientNetConfig(
        blocks=(
            BlockSpec("fused", 1, 24, 2, 3, 1),
            BlockSpec("fused", 4, 48, 4, 3, 2),
            BlockSpec("fused", 4, 64, 4, 3, 2),
            BlockSpec("mbconv", 4, 128, 6, 3, 2, 0.25),
            BlockSpec("mbconv", 6, 160, 9, 3, 1, 0.25),
            BlockSpec("mbconv", 6, 256, 15, 3, 2, 0.25),
        ),
        stem_filters=24,
        head_filters=1280,
    ),
    "efficientnetv2_m": EfficientNetConfig(
        blocks=(
            BlockSpec("fused", 1, 24, 3, 3, 1),
            BlockSpec("fused", 4, 48, 5, 3, 2),
            BlockSpec("fused", 4, 80, 5, 3, 2),
            BlockSpec("mbconv", 4, 160, 7, 3, 2, 0.25),
            BlockSpec("mbconv", 6, 176, 14, 3, 1, 0.25),
            BlockSpec("mbconv", 6, 304, 18, 3, 2, 0.25),
            BlockSpec("mbconv", 6, 512, 5, 3, 1, 0.25),
        ),
        stem_filters=24,
        head_filters=1280,
    ),
    "efficientnetv2_l": EfficientNetConfig(
        blocks=(
            BlockSpec("fused", 1, 32, 4, 3, 1),
            BlockSpec("fused", 4, 64, 7, 3, 2),
            BlockSpec("fused", 4, 96, 7, 3, 2),
            BlockSpec("mbconv", 4, 192, 10, 3, 2, 0.25),
            BlockSpec("mbconv", 6, 224, 19, 3, 1, 0.25),
            BlockSpec("mbconv", 6, 384, 25, 3, 2, 0.25),
            BlockSpec("mbconv", 6, 640, 7, 3, 1, 0.25),
        ),
        stem_filters=32,
        head_filters=1280,
    ),
}


def _act(name: str):
    if name == "silu":
        return nn.silu
    if name == "hswish":
        return nn.hard_swish
    if name == "relu":
        return nn.relu
    raise ValueError(name)


class InvertedResidual(nn.Module):
    """MBConv / FusedMBConv / depthwise-separable block."""

    spec_kind: str
    expand: float
    filters: int
    kernel: int
    strides: int
    se_ratio: float
    activation: str
    norm: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = _act(self.activation)
        in_filters = x.shape[-1]
        expanded = int(in_filters * self.expand)
        residual = x
        pad = self.kernel // 2

        if self.spec_kind == "fused":
            y = nn.Conv(
                expanded, (self.kernel, self.kernel),
                (self.strides, self.strides), padding=[(pad, pad), (pad, pad)],
                use_bias=False, dtype=self.dtype, name="fused_conv",
            )(x)
            y = self.norm(name="fused_bn")(y)
            y = act(y)
        else:
            y = x
            if self.expand != 1:
                y = nn.Conv(
                    expanded, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand_conv",
                )(y)
                y = self.norm(name="expand_bn")(y)
                y = act(y)
            y = nn.Conv(
                expanded, (self.kernel, self.kernel),
                (self.strides, self.strides), padding=[(pad, pad), (pad, pad)],
                feature_group_count=expanded, use_bias=False, dtype=self.dtype,
                name="dwconv",
            )(y)
            y = self.norm(name="dw_bn")(y)
            y = act(y)

        if self.se_ratio > 0:
            # timm EfficientNet SE sizing and activations: squeeze width
            # from the block INPUT channels (max(1, in_chs * se_ratio)),
            # block activation inside, sigmoid gate.
            y = SqueezeExcite(
                hidden=max(1, int(in_filters * self.se_ratio)),
                act=self.activation,
                dtype=self.dtype,
                name="se",
            )(y)

        y = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype,
            name="project_conv",
        )(y)
        y = self.norm(name="project_bn")(y)

        if self.strides == 1 and in_filters == self.filters:
            y = y + residual
        return y


class EfficientNet(nn.Module):
    """EfficientNet feature extractor -> [B, head_filters] pooled features."""

    config: EfficientNetConfig
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        norm = partial(
            TpuBatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(
            cfg.stem_filters, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = norm(name="stem_bn")(x)
        x = nn.silu(x)

        for stage_idx, spec in enumerate(cfg.blocks):
            for block_idx in range(spec.num_blocks):
                x = InvertedResidual(
                    spec_kind=spec.kind if spec.kind != "dsconv" else "mbconv",
                    expand=spec.expand,
                    filters=spec.filters,
                    kernel=spec.kernel,
                    strides=spec.strides if block_idx == 0 else 1,
                    se_ratio=spec.se_ratio,
                    activation=spec.activation,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"stage{stage_idx + 1}_block{block_idx + 1}",
                )(x)

        x = nn.Conv(
            cfg.head_filters, (1, 1), use_bias=False, dtype=self.dtype,
            name="head_conv",
        )(x)
        x = norm(name="head_bn")(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# MobileNetV3
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MobileNetV3Config:
    """MobileNetV3 stage list: (expand_filters, out_filters, kernel, strides,
    se, activation) per block."""

    blocks: tuple[tuple[int, int, int, int, bool, str], ...]
    head_filters: int

    @property
    def num_features(self) -> int:
        return self.head_filters


MOBILENETV3_CONFIGS: dict[str, MobileNetV3Config] = {
    "mobilenetv3_large": MobileNetV3Config(
        blocks=(
            (16, 16, 3, 1, False, "relu"),
            (64, 24, 3, 2, False, "relu"),
            (72, 24, 3, 1, False, "relu"),
            (72, 40, 5, 2, True, "relu"),
            (120, 40, 5, 1, True, "relu"),
            (120, 40, 5, 1, True, "relu"),
            (240, 80, 3, 2, False, "hswish"),
            (200, 80, 3, 1, False, "hswish"),
            (184, 80, 3, 1, False, "hswish"),
            (184, 80, 3, 1, False, "hswish"),
            (480, 112, 3, 1, True, "hswish"),
            (672, 112, 3, 1, True, "hswish"),
            (672, 160, 5, 2, True, "hswish"),
            (960, 160, 5, 1, True, "hswish"),
            (960, 160, 5, 1, True, "hswish"),
        ),
        head_filters=1280,
    ),
    "mobilenetv3_small": MobileNetV3Config(
        blocks=(
            (16, 16, 3, 2, True, "relu"),
            (72, 24, 3, 2, False, "relu"),
            (88, 24, 3, 1, False, "relu"),
            (96, 40, 5, 2, True, "hswish"),
            (240, 40, 5, 1, True, "hswish"),
            (240, 40, 5, 1, True, "hswish"),
            (120, 48, 5, 1, True, "hswish"),
            (144, 48, 5, 1, True, "hswish"),
            (288, 96, 5, 2, True, "hswish"),
            (576, 96, 5, 1, True, "hswish"),
            (576, 96, 5, 1, True, "hswish"),
        ),
        head_filters=1024,
    ),
}


class MobileNetV3(nn.Module):
    """MobileNetV3 feature extractor -> [B, head_filters] features."""

    config: MobileNetV3Config
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        norm = partial(
            TpuBatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(
            16, (3, 3), (2, 2), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = norm(name="stem_bn")(x)
        x = nn.hard_swish(x)

        for i, (expand_f, out_f, kernel, strides, use_se, act_name) in enumerate(
            cfg.blocks
        ):
            in_f = x.shape[-1]
            act = _act(act_name)
            residual = x
            pad = kernel // 2

            y = x
            if expand_f != in_f:
                y = nn.Conv(
                    expand_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"block{i + 1}_expand",
                )(y)
                y = norm(name=f"block{i + 1}_expand_bn")(y)
                y = act(y)
            y = nn.Conv(
                expand_f, (kernel, kernel), (strides, strides),
                padding=[(pad, pad), (pad, pad)], feature_group_count=expand_f,
                use_bias=False, dtype=self.dtype, name=f"block{i + 1}_dw",
            )(y)
            y = norm(name=f"block{i + 1}_dw_bn")(y)
            y = act(y)
            if use_se:
                # timm MobileNetV3 SE: squeeze width make_divisible(mid/4, 8),
                # relu inside, hard-sigmoid gate.
                y = SqueezeExcite(
                    hidden=_scale_filters(expand_f, 0.25),
                    act="relu",
                    gate="hard_sigmoid",
                    dtype=self.dtype,
                    name=f"block{i + 1}_se",
                )(y)
            y = nn.Conv(
                out_f, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"block{i + 1}_project",
            )(y)
            y = norm(name=f"block{i + 1}_project_bn")(y)
            if strides == 1 and in_f == out_f:
                y = y + residual
            x = y

        last_conv = cfg.blocks[-1][0]
        x = nn.Conv(
            last_conv, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv"
        )(x)
        x = norm(name="head_bn")(x)
        x = nn.hard_swish(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(cfg.head_filters, dtype=self.dtype, name="head_fc")(x)
        x = nn.hard_swish(x)
        return x.astype(jnp.float32)
