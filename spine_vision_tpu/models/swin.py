"""Flax Swin Transformer backbones (tiny/small/base).

Reference parity: swin_tiny/small/base via timm
(training/models/backbone.py:747-749).

TPU-first notes: window attention batches many small (49-token) attention
matmuls — XLA batches them onto the MXU. All shapes are static under jit;
feature maps are zero-padded up to window multiples and cropped back, so any
input resolution works (the reference feeds 256² crops and 512² images).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclass(frozen=True)
class SwinConfig:
    """Architecture hyperparameters for a Swin backbone."""

    embed_dim: int
    depths: tuple[int, ...]
    num_heads: tuple[int, ...]
    window_size: int = 7

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


SWIN_CONFIGS: dict[str, SwinConfig] = {
    "swin_tiny": SwinConfig(96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "swin_small": SwinConfig(96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "swin_base": SwinConfig(128, (2, 2, 18, 2), (4, 8, 16, 32)),
}


def _relative_position_index(window_size: int) -> np.ndarray:
    """Precomputed [ws*ws, ws*ws] index into the relative bias table."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += ws - 1
    relative[:, :, 1] += ws - 1
    relative[:, :, 0] *= 2 * ws - 1
    return relative.sum(-1)


def _window_partition(x: Array, ws: int) -> Array:
    """[B, H, W, C] -> [B * nH * nW, ws*ws, C] (H, W multiples of ws)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows: Array, ws: int, b: int, h: int, w: int) -> Array:
    """Inverse of :func:`_window_partition`."""
    c = windows.shape[-1]
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _attention_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask: [nW, ws*ws, ws*ws] additive (0 / -100)."""
    img_mask = np.zeros((1, h, w, 1))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Multi-head window attention with relative position bias."""

    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None) -> Array:
        bw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [bw, n, heads, hd]

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        rel_index = _relative_position_index(self.window_size)
        bias = bias_table[rel_index.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(bw, self.num_heads, n, n)

        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin block: (shifted-)window attention + MLP, pre-LN, residual."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        hp, wp = h + pad_h, w + pad_w
        shift = self.shift if min(hp, wp) > ws else 0

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        y = y.astype(self.dtype)
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_attention_mask(hp, wp, ws, shift))
        else:
            mask = None

        windows = _window_partition(y, ws)
        attn_out = WindowAttention(
            dim=self.dim, num_heads=self.num_heads, window_size=ws,
            dtype=self.dtype, name="attn",
        )(windows, mask)
        y = _window_reverse(attn_out, ws, b, hp, wp)

        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w, :]
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = y.astype(self.dtype)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """Downsample 2x: concat 2x2 neighborhood -> LN -> Dense(2*dim)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class SwinTransformer(nn.Module):
    """Swin feature extractor -> [B, num_features] pooled features."""

    config: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        x = x.astype(self.dtype)
        x = nn.Conv(
            cfg.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x)
        x = x.astype(self.dtype)

        for stage_idx, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            dim = cfg.embed_dim * 2**stage_idx
            if stage_idx > 0:
                x = PatchMerging(
                    dim=dim // 2, dtype=self.dtype, name=f"merge{stage_idx}"
                )(x)
            for block_idx in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=heads,
                    window_size=cfg.window_size,
                    shift=0 if block_idx % 2 == 0 else cfg.window_size // 2,
                    dtype=self.dtype,
                    name=f"stage{stage_idx + 1}_block{block_idx + 1}",
                )(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
