"""Flax Vision Transformer backbones (ViT / DeiT-III variants).

The reference exposes vit_tiny/small/base/large and deit_tiny/small/base via
timm (training/models/backbone.py:737-745); DeiT-III is architecturally a ViT
with a different training recipe, so both families share this module.

TPU-first notes: attention and MLP are MXU matmuls in bf16; sequence length
for 224² inputs at patch 16 is 197 — padded to lane multiples by XLA. Token
pooling uses the class token (timm's default for these checkpoints).
Position embeddings are bilinearly interpolated when the input grid differs
from the 224² training grid, so 512² localization inputs work.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class ViTConfig:
    """Architecture hyperparameters for a ViT backbone."""

    patch_size: int
    hidden_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0

    @property
    def num_features(self) -> int:
        return self.hidden_dim


VIT_CONFIGS: dict[str, ViTConfig] = {
    "vit_tiny": ViTConfig(16, 192, 12, 3),
    "vit_small": ViTConfig(16, 384, 12, 6),
    "vit_base": ViTConfig(16, 768, 12, 12),
    "vit_large": ViTConfig(16, 1024, 24, 16),
    "deit_tiny": ViTConfig(16, 384, 12, 6),  # reference maps deit_tiny->deit3_small
    "deit_small": ViTConfig(16, 384, 12, 6),
    "deit_base": ViTConfig(16, 768, 12, 12),
}


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block."""

    hidden_dim: int
    num_heads: int
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y = y.astype(self.dtype)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            deterministic=deterministic,
            name="attn",
        )(y, y)
        x = x + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = y.astype(self.dtype)
        y = nn.Dense(int(self.hidden_dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """ViT feature extractor: images -> [B, hidden_dim] class-token features."""

    config: ViTConfig
    dtype: Any = jnp.float32
    pos_embed_grid: int = 14  # training grid (224/16)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = nn.Conv(
            cfg.hidden_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, cfg.hidden_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.pos_embed_grid * self.pos_embed_grid + 1, cfg.hidden_dim),
        )

        # Interpolate grid position embeddings when input resolution differs.
        if (gh, gw) != (self.pos_embed_grid, self.pos_embed_grid):
            grid_pe = pos_embed[:, 1:, :].reshape(
                1, self.pos_embed_grid, self.pos_embed_grid, cfg.hidden_dim
            )
            grid_pe = jax.image.resize(
                grid_pe, (1, gh, gw, cfg.hidden_dim), method="bilinear"
            )
            pos = jnp.concatenate(
                [pos_embed[:, :1, :], grid_pe.reshape(1, gh * gw, cfg.hidden_dim)],
                axis=1,
            )
        else:
            pos = pos_embed

        cls = jnp.broadcast_to(cls_token, (b, 1, cfg.hidden_dim)).astype(self.dtype)
        x = jnp.concatenate([cls, x], axis=1) + pos.astype(self.dtype)

        for i in range(cfg.depth):
            x = TransformerBlock(
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"block{i + 1}",
            )(x, deterministic=not train)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x[:, 0, :].astype(jnp.float32)
