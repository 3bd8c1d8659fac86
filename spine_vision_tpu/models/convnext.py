"""Flax ConvNeXt v1/v2 backbones.

The reference's flagship localization backbone is ConvNeXt-base @ 512²
(trainers/localization.py:40); it exposes tiny..xlarge (v1) and tiny..huge
(v2) via timm (training/models/backbone.py:726-736).

TPU-first design notes:
- NHWC, depthwise 7x7 conv (feature_group_count=C) + pointwise MLP: both map
  well to TPU (depthwise on VPU, pointwise 1x1 as MXU matmuls).
- LayerNorm-only normalization -> no mutable state, purely functional apply
  (no batch_stats plumbing, ideal under pjit).
- ``dtype`` bf16 compute / fp32 params; LayerNorm accumulates in fp32.
- v2 replaces LayerScale with GRN (global response normalization) inside the
  MLP, per the ConvNeXt-V2 paper.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class ConvNeXtConfig:
    """Architecture hyperparameters for a ConvNeXt backbone."""

    depths: tuple[int, ...]
    dims: tuple[int, ...]
    use_grn: bool = False  # v2
    layer_scale_init: float = 1e-6  # v1 LayerScale (ignored when use_grn)

    @property
    def num_features(self) -> int:
        return self.dims[-1]


CONVNEXT_CONFIGS: dict[str, ConvNeXtConfig] = {
    "convnext_tiny": ConvNeXtConfig((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ConvNeXtConfig((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ConvNeXtConfig((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ConvNeXtConfig((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ConvNeXtConfig((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnextv2_tiny": ConvNeXtConfig((3, 3, 9, 3), (96, 192, 384, 768), use_grn=True),
    "convnextv2_small": ConvNeXtConfig(
        (3, 3, 27, 3), (96, 192, 384, 768), use_grn=True
    ),
    "convnextv2_base": ConvNeXtConfig(
        (3, 3, 27, 3), (128, 256, 512, 1024), use_grn=True
    ),
    "convnextv2_large": ConvNeXtConfig(
        (3, 3, 27, 3), (192, 384, 768, 1536), use_grn=True
    ),
    "convnextv2_huge": ConvNeXtConfig(
        (3, 3, 27, 3), (352, 704, 1408, 2816), use_grn=True
    ),
}


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2).

    gx = ||x||_2 over spatial dims per channel; nx = gx / mean_c(gx);
    out = gamma * x * nx + beta + x.
    """

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(xf * xf, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(x.dtype)


class _DwConvParams(nn.Module):
    """Param holder matching nn.Conv's tree (kernel [7,7,1,C] + bias)."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, self.dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return kernel, bias


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree (kernel [in,out] + bias)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Param holder matching nn.LayerNorm's tree (scale + bias)."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class ConvNeXtBlock(nn.Module):
    """Depthwise 7x7 -> LN -> pwconv(4x) -> GELU -> [GRN] -> pwconv + residual."""

    dim: int
    use_grn: bool
    layer_scale_init: float
    dtype: Any = jnp.float32
    use_pallas_dwconv: bool = False
    use_pallas_mlp: bool = False
    # Whole-block TRAINING kernel (ops.block_train): megakernel forward +
    # single fused backward (MLP/LN/depthwise grads) + one XLA conv for dx.
    use_pallas_block: bool = False
    # Hybrid TRAINING kernel (ops.block_train.convnext_block_hybrid):
    # megakernel forward emitting the conv intermediate + the composed
    # backward (resident LN-MLP kernel + XLA grouped-conv gradients).
    use_pallas_hybrid: bool = False
    # "tanh" (framework default; matches the Pallas kernels, deviation from
    # erf < bf16 rounding) or "erf" (exact torch nn.GELU — for f32-level
    # parity checks against reference/timm checkpoints; XLA path only, so
    # the Pallas flags are ignored when set).
    gelu: str = "tanh"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import jax

        from spine_vision_tpu.ops.fused_mlp import MAX_FUSED_DIM

        # Mosaic requires the channel (lane) dim to be a multiple of 128 on
        # real TPUs — C=96 (convnext_tiny) fails at compile with
        # "Slice shape along dimension 3 must be aligned to tiling (128)".
        # CPU interpret mode has no such constraint (parity tests use it).
        lane_ok = self.dim % 128 == 0 or jax.default_backend() == "cpu"
        use_pallas_dwconv = (
            self.use_pallas_dwconv and self.gelu != "erf" and lane_ok
        )
        use_pallas_mlp = self.use_pallas_mlp and self.gelu != "erf" and lane_ok
        use_pallas_block = (
            self.use_pallas_block and self.gelu != "erf" and lane_ok
        )
        use_pallas_hybrid = (
            self.use_pallas_hybrid and self.gelu != "erf" and lane_ok
        )
        if (
            (use_pallas_block or use_pallas_hybrid)
            and not self.use_grn
            and self.dim <= MAX_FUSED_DIM
            and self.layer_scale_init > 0
        ):
            import jax

            from spine_vision_tpu.ops.block_train import (
                convnext_block_hybrid,
                convnext_block_train,
            )

            block_fn = (
                convnext_block_hybrid if use_pallas_hybrid
                else convnext_block_train
            )

            kernel, bias = _DwConvParams(self.dim, name="dwconv")()
            scale, beta = _LayerNormParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            return block_fn(
                x.astype(self.dtype),
                kernel.reshape(7, 7, self.dim).astype(self.dtype),
                bias,
                scale,
                beta,
                w1.astype(self.dtype),
                b1,
                w2.astype(self.dtype),
                b2,
                gamma,
                interpret=jax.default_backend() == "cpu",
            )
        if (
            use_pallas_dwconv
            and use_pallas_mlp
            and not self.use_grn
            and self.dim <= MAX_FUSED_DIM
        ):
            # Whole-block megakernel (ops.convnext_block): dwconv+LN+MLP+
            # LayerScale+residual with ONE HBM read of x and ONE write of
            # the output (the block ops are streaming-bound — see the
            # module docstring there). Param tree identical to the XLA
            # path, so checkpoints are interchangeable with the flags off.
            import jax

            from spine_vision_tpu.ops.convnext_block import convnext_block_fused

            kernel, bias = _DwConvParams(self.dim, name="dwconv")()
            scale, beta = _LayerNormParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
            gamma = (
                self.param(
                    "gamma",
                    nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
                if self.layer_scale_init > 0
                else jnp.ones((self.dim,), jnp.float32)
            )
            return convnext_block_fused(
                x.astype(self.dtype),
                kernel.reshape(7, 7, self.dim).astype(self.dtype),
                bias,
                scale,
                beta,
                w1.astype(self.dtype),
                b1,
                w2.astype(self.dtype),
                b2,
                gamma,
                interpret=jax.default_backend() == "cpu",
            )

        residual = x
        if use_pallas_dwconv:
            # Fused Pallas dwconv+bias+LayerNorm (ops.dwconv): measured
            # faster than the XLA sequence at every ConvNeXt stage on v5e
            # (3.4 vs 4.5 ms at C=128, 2.4 vs 3.7 at C=256, 2.8 vs 3.1 at
            # C=512, 1.7 vs 1.9 at C=1024, batch 32). Param tree identical
            # to the nn.Conv + nn.LayerNorm pair, so checkpoints are
            # interchangeable with the flag off.
            import jax

            from spine_vision_tpu.ops.dwconv import depthwise_conv7x7_ln

            kernel, bias = _DwConvParams(self.dim, name="dwconv")()
            scale, beta = _LayerNormParams(self.dim, name="norm")()
            y = depthwise_conv7x7_ln(
                x.astype(self.dtype),
                kernel.reshape(7, 7, self.dim).astype(self.dtype),
                bias,
                scale,
                beta,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            from spine_vision_tpu.ops.fused_mlp import MAX_FUSED_DIM

            y = nn.Conv(
                self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
            )(x)
            if (
                use_pallas_mlp
                and not self.use_grn
                and self.dim <= MAX_FUSED_DIM
                and self.layer_scale_init > 0
            ):
                # LN-fused training kernel (ops.fused_mlp.fused_ln_mlp): the
                # per-block LayerNorm runs inside the Pallas kernel in BOTH
                # directions, removing XLA's standalone LN forward/backward
                # [M, C] round trips per block. Param tree matches
                # nn.LayerNorm + nn.Dense pair + gamma exactly.
                import jax

                from spine_vision_tpu.ops.fused_mlp import fused_ln_mlp

                scale, beta = _LayerNormParams(self.dim, name="norm")()
                w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
                w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
                gamma = self.param(
                    "gamma",
                    nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
                # NHWC blocks straight into the kernel: the old
                # [B,H,W,C] -> [M,C] reshape at the custom-call boundary
                # cost an XLA layout copy each way (~8 ms/step total).
                return fused_ln_mlp(
                    y.astype(self.dtype),
                    scale,
                    beta,
                    w1.astype(self.dtype),
                    b1,
                    w2.astype(self.dtype),
                    b2,
                    gamma,
                    residual.astype(self.dtype),
                    interpret=jax.default_backend() == "cpu",
                )
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(y)
        y = y.astype(self.dtype)

        from spine_vision_tpu.ops.fused_mlp import MAX_FUSED_DIM

        if use_pallas_mlp and not self.use_grn and self.dim <= MAX_FUSED_DIM:
            # Fused Pallas MLP+LayerScale+residual (ops.fused_mlp): the 4C
            # hidden stays in VMEM and the block tail is absorbed so no
            # standalone elementwise pass trails the custom call. Param tree
            # identical to the nn.Dense pair + gamma, so checkpoints are
            # interchangeable with the flag off. GRN (v2) and C=1024 fall
            # back to the XLA path. (With use_pallas_dwconv the LN already
            # ran inside the dwconv kernel, so this branch handles the MLP.)
            import jax

            from spine_vision_tpu.ops.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
            gamma = (
                self.param(
                    "gamma",
                    nn.initializers.constant(self.layer_scale_init),
                    (self.dim,),
                )
                if self.layer_scale_init > 0
                else None
            )
            b, hgt, wid, c = y.shape
            out = fused_mlp(
                y.reshape(b * hgt * wid, c),
                w1.astype(self.dtype),
                b1,
                w2.astype(self.dtype),
                b2,
                gamma=gamma,
                residual=residual.astype(self.dtype).reshape(b * hgt * wid, c),
                interpret=jax.default_backend() == "cpu",
            )
            return out.reshape(b, hgt, wid, c)

        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        # tanh-GELU framework-wide for the block MLP: matches the Pallas
        # kernels (ops/fused_mlp.py:_tanh_gelu — erf costs real VPU time in
        # Mosaic, deviation < bf16 rounding), keeping flag paths
        # interchangeable. gelu="erf" opts into exact torch-GELU parity.
        y = nn.gelu(y, approximate=self.gelu != "erf")
        if self.use_grn:
            y = GRN(dim=4 * self.dim, name="grn")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        if not self.use_grn and self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            y = y * gamma.astype(self.dtype)
        return residual + y


class ConvNeXt(nn.Module):
    """ConvNeXt feature extractor: images -> [B, num_features] pooled features.

    Matches the timm num_classes=0 backbone contract: global average pool
    followed by a final LayerNorm.
    """

    config: ConvNeXtConfig
    dtype: Any = jnp.float32
    use_pallas_dwconv: bool = False
    use_pallas_mlp: bool = False
    use_pallas_block: bool = False
    use_pallas_hybrid: bool = False
    gelu: str = "tanh"  # "erf" = exact torch-GELU parity (XLA path only)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        x = x.astype(self.dtype)

        # Patchify stem: 4x4 non-overlapping conv + LN.
        x = nn.Conv(
            cfg.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        x = x.astype(self.dtype)

        for stage_idx, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if stage_idx > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=jnp.float32,
                    name=f"downsample{stage_idx}_norm",
                )(x)
                x = x.astype(self.dtype)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"downsample{stage_idx}_conv",
                )(x)
            for block_idx in range(depth):
                x = ConvNeXtBlock(
                    dim=dim,
                    use_grn=cfg.use_grn,
                    layer_scale_init=cfg.layer_scale_init,
                    dtype=self.dtype,
                    use_pallas_dwconv=self.use_pallas_dwconv,
                    use_pallas_mlp=self.use_pallas_mlp,
                    use_pallas_block=self.use_pallas_block,
                    use_pallas_hybrid=self.use_pallas_hybrid,
                    gelu=self.gelu,
                    name=f"stage{stage_idx + 1}_block{block_idx + 1}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="head_norm")(x)
        return x.astype(jnp.float32)
