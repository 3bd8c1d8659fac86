"""Fully fused ConvNeXt block: one Pallas kernel per (batch, h-tile).

dwconv7x7 + bias + LayerNorm + pwMLP(GELU) + LayerScale + residual — the
entire block body (reference consumes it via timm,
training/models/backbone.py:25-85) — computed with a single HBM read of x
and a single HBM write of the output.

Why: the C=128 ablation showed these kernels are streaming-bound (a
copy-only kernel costs 3.5 ms vs 0.2 ms of matmul time), so the win is in
bytes, not FLOPs. The two-kernel path (ops.dwconv + ops.fused_mlp) moves
5 full activation arrays through HBM per block (x in, y out; y in,
residual in, out out); this kernel moves 2. The depthwise halo tile it
already holds in VMEM doubles as the residual, free.

Backward (custom VJP) composes the existing Pallas backward kernels:
recompute y with the dwconv+LN forward stencil, run the fused-MLP backward
(hidden recomputed chunk-wise in VMEM), then the dwconv+LN backward; the
residual cotangent folds into dx. Nothing hidden-sized touches HBM in
either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spine_vision_tpu.ops.dwconv import (
    KERNEL_SIZE,
    PAD,
    _dw_ln_bwd_pallas,
    _dw_ln_pallas,
)
from spine_vision_tpu.ops.fused_mlp import (
    MAX_FUSED_DIM,
    _tanh_gelu,
    _mlp_bwd_pallas,
)


# Per-C forward tile-height overrides for tuning probes (empty = use the
# VMEM budget rule below). Set from scripts; not a public knob.
_FWD_TILE_H: dict[int, int] = {}


def _make_block_kernel(num_tiles: int, eps: float, rh: int, emit_conv: bool = False):
    """Kernel over a flattened (batch * h-tile) grid, double-buffered DMA.

    With ``emit_conv`` the kernel also writes the post-conv pre-LN
    activation ``t = dwconv(x) + bias`` (rounded to the output dtype, and
    the LayerNorm consumes the ROUNDED value) so a checkpoint-style
    backward that recomputes LN/hidden from ``t`` sees exactly the
    forward's numerics — the hybrid training path (ops.block_train)."""

    def kernel(
        x_hbm, k_ref, bias_ref, scale_ref, beta_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
        out_ref, *rest,
    ):
        if emit_conv:
            t_ref, tiles, sems = rest
        else:
            tiles, sems = rest
        _, th, w, c = out_ref.shape
        g = pl.program_id(0)
        total = pl.num_programs(0)

        def start_dma(step, slot):
            i = step // num_tiles
            j = step % num_tiles
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * th, th + 2 * PAD), :, :],
                tiles.at[slot],
                sems.at[slot],
            )

        @pl.when(g == 0)
        def _():
            start_dma(0, 0).start()

        @pl.when(g + 1 < total)
        def _():
            start_dma(g + 1, (g + 1) % 2).start()

        start_dma(g, g % 2).wait()
        tile = tiles[g % 2]

        # dwconv + bias (H shifts before W shifts: sublane relayouts are
        # the expensive ones, keep them to KERNEL_SIZE).
        acc = jnp.zeros((th, w, c), jnp.float32)
        for dx in range(KERNEL_SIZE):
            col = tile[0:th, :, :].astype(jnp.float32) * k_ref[dx, :].astype(
                jnp.float32
            )
            for dy in range(1, KERNEL_SIZE):
                col = col + tile[dy : dy + th, :, :].astype(
                    jnp.float32
                ) * k_ref[dy * KERNEL_SIZE + dx, :].astype(jnp.float32)
            acc = acc + col[:, dx : dx + w, :]
        acc = acc + bias_ref[0, :].astype(jnp.float32)
        if emit_conv:
            t_lp = acc.astype(t_ref.dtype)
            t_ref[0] = t_lp
            acc = t_lp.astype(jnp.float32)

        # channel LayerNorm
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        centered = acc - mu
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        y = centered * jax.lax.rsqrt(var + eps)
        y = y * scale_ref[0, :].astype(jnp.float32) + beta_ref[0, :].astype(
            jnp.float32
        )
        y_lp = y.astype(out_ref.dtype)

        gamma_f = gamma_ref[0, :].astype(jnp.float32)
        b1f = b1_ref[0, :].astype(jnp.float32)
        b2f = b2_ref[0, :].astype(jnp.float32)

        # MLP + LayerScale + residual, row-chunked so the 4C hidden stays
        # small; the residual rows come straight from the halo tile.
        for r0 in range(0, th, rh):
            rows = y_lp[r0 : r0 + rh].reshape(rh * w, c)
            hpre = jnp.dot(rows, w1_ref[:], preferred_element_type=jnp.float32)
            h = _tanh_gelu(hpre + b1f).astype(out_ref.dtype)
            out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
            out = (out + b2f) * gamma_f
            res = tile[PAD + r0 : PAD + r0 + rh, PAD : PAD + w, :]
            out = out.reshape(rh, w, c) + res.astype(jnp.float32)
            out_ref[0, r0 : r0 + rh] = out.astype(out_ref.dtype)

    return kernel


def _block_pallas(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    tile_h: int,
    eps: float,
    interpret: bool,
    emit_conv: bool = False,
) -> Array | tuple[Array, Array]:
    b, h, w, c = x.shape
    hd = w1.shape[1]
    padded_w = ((w + 2 * PAD + 7) // 8) * 8
    th = min(tile_h, h)
    if c in _FWD_TILE_H:
        # Probe override (scripts/bench_block_train.py tuning): skips the
        # budget rule — the compile itself is the experiment.
        th = min(_FWD_TILE_H[c], h)
    else:
        # Budget rule from ops.dwconv, tightened: the MLP adds resident
        # weights (w1+w2) and a row-chunked hidden on top of the halo tile
        # + f32 y.
        while th > 8 and (th + 2 * PAD) * padded_w * c * 4 > 2 * 1024 * 1024:
            th //= 2
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th

    # Rows per MLP sub-step: cap the f32 hidden chunk at ~2 MB.
    max_tokens = max(256, (2 * 1024 * 1024) // (4 * hd))
    rh = max(1, min(th, max_tokens // w))
    while th % rh:
        rh -= 1

    xp = jnp.pad(
        x,
        ((0, 0), (PAD, PAD + padded_h - h), (PAD, padded_w - w - PAD), (0, 0)),
    )
    k2 = kernel.reshape(KERNEL_SIZE * KERNEL_SIZE, c)

    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda g: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    tile_spec = pl.BlockSpec(
        (1, th, w, c),
        lambda g: (g // num_tiles, g % num_tiles, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tile_shape = jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype)
    out = pl.pallas_call(
        _make_block_kernel(num_tiles, eps, rh, emit_conv),
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd
            fix((KERNEL_SIZE * KERNEL_SIZE, c)),
            fix((1, c)),
            fix((1, c)),
            fix((1, c)),
            fix((c, hd)),
            fix((1, hd)),
            fix((hd, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_specs=[tile_spec, tile_spec] if emit_conv else tile_spec,
        out_shape=[tile_shape, tile_shape] if emit_conv else tile_shape,
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        xp, k2, bias.reshape(1, c), ln_scale.reshape(1, c),
        ln_bias.reshape(1, c), w1, b1.reshape(1, hd), w2, b2.reshape(1, c),
        gamma.reshape(1, c),
    )
    if emit_conv:
        return out[0][:, :h], out[1][:, :h]
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _block_ad(
    x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    tile_h, eps, interpret,
):
    return _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )


def _block_fwd(x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
               tile_h, eps, interpret):
    out = _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )
    return out, (x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _block_bwd(tile_h, eps, interpret, saved, g):
    x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma = saved
    b, h, w, c = x.shape

    # Recompute the block's LN output (checkpoint-style), then chain the
    # two Pallas backward kernels.
    y = _dw_ln_pallas(x, kernel, bias, ln_scale, ln_bias, tile_h, eps, interpret)
    g2 = g.reshape(-1, c)
    dy2, dw1, db1, dw2, db2, dgamma = _mlp_bwd_pallas(
        y.reshape(-1, c), w1, b1, w2, b2, gamma, g2, interpret
    )
    dy = dy2.reshape(b, h, w, c).astype(x.dtype)
    dx1, dk, dbias, dscale, dbeta = _dw_ln_bwd_pallas(
        x, kernel, bias, ln_scale, dy, tile_h, eps, interpret
    )
    dx = (dx1.astype(jnp.float32) + g.astype(jnp.float32)).astype(x.dtype)
    return (
        dx,
        dk.astype(kernel.dtype),
        dbias.astype(bias.dtype),
        dscale.astype(ln_scale.dtype),
        dbeta.astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
    )


_block_ad.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret"))
def convnext_block_fused(
    x: Array,
    dw_kernel: Array,
    dw_bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    tile_h: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """One fused ConvNeXt v1 block:
    ``x + gamma * mlp(LayerNorm(dwconv7x7(x) + bias))``.

    Args:
        x: [B, H, W, C] input, C a multiple of 128 and <= MAX_FUSED_DIM.
        dw_kernel: [7, 7, C]; dw_bias: [C].
        ln_scale, ln_bias: [C] LayerNorm affine.
        w1: [C, H']; b1: [H']; w2: [H', C]; b2: [C]; gamma: [C] LayerScale.

    Returns:
        [B, H, W, C], dtype of ``x``. Differentiable (custom VJP, all-Pallas
        backward).
    """
    if x.shape[-1] > MAX_FUSED_DIM:
        raise ValueError(
            f"C={x.shape[-1]} exceeds MAX_FUSED_DIM={MAX_FUSED_DIM}; use the "
            "two-kernel path (ops.dwconv + XLA MLP)."
        )
    return _block_ad(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )
