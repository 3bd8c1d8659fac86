"""Backbone registry and factory for vision models.

Mirrors the reference's 46-name backbone surface
(training/models/backbone.py:25-85), but each name resolves to a Flax module
built by this framework instead of a timm download. ``BackboneFactory.create``
returns ``(module, feature_dim)`` where the module maps
[B, H, W, 3] images -> [B, feature_dim] pooled features.

Note on pretrained weights: torch/timm checkpoints are not used on the TPU
path. ``pretrained`` is accepted for API compatibility; checkpoint loading
goes through orbax (train.checkpoint) with an offline conversion story for
ImageNet initializations.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spine_vision_tpu.models.convnext import CONVNEXT_CONFIGS, ConvNeXt
from spine_vision_tpu.models.efficientnet import (
    EFFICIENTNET_CONFIGS,
    MOBILENETV3_CONFIGS,
    EfficientNet,
    MobileNetV3,
)
from spine_vision_tpu.models.resnet import RESNET_CONFIGS, ResNet
from spine_vision_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
from spine_vision_tpu.models.vit import VIT_CONFIGS, ViT

# Full reference-parity name list (training/models/backbone.py:25-85); the
# resnet50 recipe variants (a2/b/c/d) share the resnet50 architecture — the
# distinction in the reference is pretrained-weight recipes only.
BACKBONES: dict[str, str] = {
    # ResNet family
    "resnet18": "resnet:resnet18",
    "resnet34": "resnet:resnet34",
    "resnet50": "resnet:resnet50",
    "resnet101": "resnet:resnet101",
    "resnet152": "resnet:resnet152",
    "resnet50_a2": "resnet:resnet50",
    "resnet50_b": "resnet:resnet50",
    "resnet50_c": "resnet:resnet50",
    "resnet50_d": "resnet:resnet50",
    "resnext50": "resnet:resnext50",
    "resnext101": "resnet:resnext101",
    "wide_resnet50": "resnet:wide_resnet50",
    "wide_resnet101": "resnet:wide_resnet101",
    "resnetrs50": "resnet:resnetrs50",
    "resnetrs101": "resnet:resnetrs101",
    "resnetrs152": "resnet:resnetrs152",
    # ConvNeXt
    "convnext_tiny": "convnext:convnext_tiny",
    "convnext_small": "convnext:convnext_small",
    "convnext_base": "convnext:convnext_base",
    "convnext_large": "convnext:convnext_large",
    "convnext_xlarge": "convnext:convnext_xlarge",
    "convnextv2_tiny": "convnext:convnextv2_tiny",
    "convnextv2_small": "convnext:convnextv2_small",
    "convnextv2_base": "convnext:convnextv2_base",
    "convnextv2_large": "convnext:convnextv2_large",
    "convnextv2_huge": "convnext:convnextv2_huge",
    # ViT / DeiT
    "vit_tiny": "vit:vit_tiny",
    "vit_small": "vit:vit_small",
    "vit_base": "vit:vit_base",
    "vit_large": "vit:vit_large",
    "deit_tiny": "vit:deit_tiny",
    "deit_small": "vit:deit_small",
    "deit_base": "vit:deit_base",
    # Swin
    "swin_tiny": "swin:swin_tiny",
    "swin_small": "swin:swin_small",
    "swin_base": "swin:swin_base",
    # EfficientNet v1/v2
    "efficientnet_b0": "efficientnet:efficientnet_b0",
    "efficientnet_b1": "efficientnet:efficientnet_b1",
    "efficientnet_b2": "efficientnet:efficientnet_b2",
    "efficientnet_b3": "efficientnet:efficientnet_b3",
    "efficientnet_b4": "efficientnet:efficientnet_b4",
    "efficientnetv2_s": "efficientnet:efficientnetv2_s",
    "efficientnetv2_m": "efficientnet:efficientnetv2_m",
    "efficientnetv2_l": "efficientnet:efficientnetv2_l",
    # MobileNetV3
    "mobilenetv3_small": "mobilenet:mobilenetv3_small",
    "mobilenetv3_large": "mobilenet:mobilenetv3_large",
}


class BackboneFactory:
    """Factory for backbone feature extractors."""

    _feature_dims: dict[str, int] = {}

    @classmethod
    def create(
        cls,
        name: str,
        pretrained: bool = False,
        dtype: Any = jnp.bfloat16,
        axis_name: str | None = None,
        use_pallas: bool | str = False,
        norm_impl: str = "tpu",
        pool_impl: str = "flax",
    ) -> tuple[nn.Module, int]:
        """Create a backbone module.

        Args:
            name: Backbone name (see BACKBONES).
            pretrained: Accepted for API compatibility (weight loading is an
                orbax checkpoint concern, not a module-construction one).
            dtype: Compute dtype (bf16 default — TPU MXU native).
            axis_name: Optional mesh axis for cross-device BatchNorm sync
                (ResNet/EfficientNet families).
            use_pallas: Enable the fused Pallas kernels where a family has
                them (ConvNeXt). True = all (dwconv+LN and MLP+tail; 1.66x
                forward on v5e — see AGENTS.md); "mlp" = just the LN-fused
                MLP (the round-2 training default); "block" = the whole-
                block TRAINING kernel (ops.block_train: megakernel forward
                + single fused backward with depthwise grads folded in;
                measured slower — kept for reference); "hybrid" = megakernel
                forward emitting the conv intermediate + the composed
                backward (resident LN-MLP kernel + XLA conv grads).
                All modes carry custom VJPs, so every setting is trainable.
            norm_impl: ResNet family only — "tpu" (fused bf16 TpuBatchNorm)
                or "flax" (stock nn.BatchNorm). Same variable layout either
                way, so checkpoints are interchangeable.
            pool_impl: ResNet family only — "tpu" (scatter-free max pool)
                or "flax" (nn.max_pool / select_and_scatter gradient).

        Returns:
            (module, feature_dim).
        """
        if name not in BACKBONES:
            available = ", ".join(sorted(BACKBONES))
            raise ValueError(f"Unknown backbone: {name}. Available: {available}")

        family, variant = BACKBONES[name].split(":")
        module: nn.Module
        if family == "resnet":
            config = RESNET_CONFIGS[variant]
            module = ResNet(
                config=config,
                dtype=dtype,
                axis_name=axis_name,
                norm_impl=norm_impl,
                pool_impl=pool_impl,
            )
            dim = config.num_features
        elif family == "convnext":
            cn_config = CONVNEXT_CONFIGS[variant]
            module = ConvNeXt(
                config=cn_config,
                dtype=dtype,
                use_pallas_dwconv=use_pallas is True,
                use_pallas_mlp=use_pallas in (True, "mlp", "hybrid"),
                use_pallas_block=use_pallas == "block",
                use_pallas_hybrid=use_pallas == "hybrid",
            )
            dim = cn_config.num_features
        elif family == "vit":
            vit_config = VIT_CONFIGS[variant]
            module = ViT(config=vit_config, dtype=dtype)
            dim = vit_config.num_features
        elif family == "swin":
            swin_config = SWIN_CONFIGS[variant]
            module = SwinTransformer(config=swin_config, dtype=dtype)
            dim = swin_config.num_features
        elif family == "efficientnet":
            eff_config = EFFICIENTNET_CONFIGS[variant]
            module = EfficientNet(config=eff_config, dtype=dtype, axis_name=axis_name)
            dim = eff_config.num_features
        elif family == "mobilenet":
            mob_config = MOBILENETV3_CONFIGS[variant]
            module = MobileNetV3(config=mob_config, dtype=dtype, axis_name=axis_name)
            dim = mob_config.num_features
        else:  # pragma: no cover - registry invariant
            raise ValueError(f"Unknown backbone family: {family}")

        cls._feature_dims[name] = dim
        return module, dim

    @classmethod
    def get_feature_dim(cls, name: str) -> int:
        """Feature dimension for a backbone (no module construction needed)."""
        if name in cls._feature_dims:
            return cls._feature_dims[name]
        _, dim = cls.create(name, pretrained=False)
        return dim

    @classmethod
    def list_backbones(cls, family: str | None = None) -> list[str]:
        """List backbone names, optionally filtered by family prefix."""
        if family is None:
            return sorted(BACKBONES)
        return sorted(n for n in BACKBONES if n.startswith(family.lower()))


def list_backbones(family: str | None = None) -> list[str]:
    """List available backbone names."""
    return BackboneFactory.list_backbones(family)
