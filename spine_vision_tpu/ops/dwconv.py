"""Pallas depthwise 7x7 convolution (NHWC) for ConvNeXt blocks.

XLA lowers ``feature_group_count=C`` convolutions poorly on TPU: measured
cost for ConvNeXt-base shapes is ~50x off the HBM roofline, and the dw convs
end up costing more than the block MLPs. The op is memory-bound stencil
work — exactly what a Pallas VPU kernel does well.

Structure (pallas_guide.md): the padded image stays in HBM; each (batch,
h-tile) grid step DMAs its tile + halo rows into VMEM scratch (overlapping
windows cannot be expressed as BlockSpec blocks, whose offsets are in block
units), then accumulates the 49 shifted multiply-adds in f32 on the VPU.
C rides the 128-wide lane dimension (ConvNeXt widths are multiples of 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_SIZE = 7
PAD = KERNEL_SIZE // 2


def _dw_kernel(x_hbm, k_ref, out_ref, tile, sem):
    """One (batch, h-tile) step: out[1, th, W, C]."""
    _, th, w, _ = out_ref.shape
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * th, th + 2 * PAD), :, :], tile, sem
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for dy in range(KERNEL_SIZE):
        for dx in range(KERNEL_SIZE):
            window = tile[dy : dy + th, dx : dx + w, :].astype(jnp.float32)
            acc = acc + window * k_ref[dy * KERNEL_SIZE + dx, :].astype(
                jnp.float32
            )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def depthwise_conv7x7(
    x: Array,
    kernel: Array,
    tile_h: int = 32,
    interpret: bool = False,
) -> Array:
    """Depthwise 7x7 SAME convolution, NHWC, per-channel weights.

    Args:
        x: [B, H, W, C] input (bf16/f32). C should be a multiple of 128 for
            full lane utilization (ConvNeXt widths are).
        kernel: [7, 7, C] per-channel filter.
        tile_h: H rows produced per grid step (VMEM sizing knob).
        interpret: Run in interpreter mode (CPU tests).

    Returns:
        [B, H, W, C] output, same dtype as ``x``.
    """
    b, h, w, c = x.shape
    th = min(tile_h, h)
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th
    # DMA slices along the sublane (W) dim must be 8-aligned (Mosaic tiling).
    padded_w = ((w + 2 * PAD + 7) // 8) * 8

    # SAME halo (+ H rounded to a tile multiple) materialized in HBM.
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (PAD, PAD + padded_h - h),
            (PAD, padded_w - w - PAD),
            (0, 0),
        ),
    )
    k2 = kernel.reshape(KERNEL_SIZE * KERNEL_SIZE, c)

    out = pl.pallas_call(
        _dw_kernel,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec(
                (KERNEL_SIZE * KERNEL_SIZE, c),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k2)
    return out[:, :h]


def depthwise_conv7x7_reference(x: Array, kernel: Array) -> Array:
    """lax grouped-conv reference (for parity tests and non-TPU fallback)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        kernel.reshape(KERNEL_SIZE, KERNEL_SIZE, 1, c),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
