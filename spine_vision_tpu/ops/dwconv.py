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


def _make_dw_kernel(num_tiles: int):
    """Double-buffered kernel over a flattened (batch * h-tile) grid."""

    def kernel(x_hbm, k_ref, out_ref, tiles, sems):
        _, th, w, _ = out_ref.shape
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

        # Warm up the pipeline on the first step; then each step prefetches
        # its successor before computing (guide: double-buffering pattern).
        @pl.when(g == 0)
        def _():
            start_dma(0, 0).start()

        @pl.when(g + 1 < total)
        def _():
            start_dma(g + 1, (g + 1) % 2).start()

        start_dma(g, g % 2).wait()
        tile = tiles[g % 2]

        # Loop order matters: H shifts move whole rows (free), W shifts
        # relayout sublanes (expensive). Accumulating over dy first leaves
        # only KERNEL_SIZE sublane-shifted adds instead of KERNEL_SIZE^2.
        acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
        for dx in range(KERNEL_SIZE):
            col = tile[0:th, :, :].astype(jnp.float32) * k_ref[
                dx, :
            ].astype(jnp.float32)
            for dy in range(1, KERNEL_SIZE):
                col = col + tile[dy : dy + th, :, :].astype(
                    jnp.float32
                ) * k_ref[dy * KERNEL_SIZE + dx, :].astype(jnp.float32)
            acc = acc + col[:, dx : dx + w, :]
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


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
    # DMA slices along the sublane (W) dim must be 8-aligned (Mosaic tiling).
    padded_w = ((w + 2 * PAD + 7) // 8) * 8
    # Shrink the H tile until the kernel's f32 working set (tile + column
    # accumulator + output accumulator) fits comfortably in VMEM.
    th = min(tile_h, h)
    while th > 8 and (th + 2 * PAD) * padded_w * c * 4 > 2 * 1024 * 1024:
        th //= 2
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th

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
        _make_dw_kernel(num_tiles),
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec(
                (KERNEL_SIZE * KERNEL_SIZE, c),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c),
            lambda g: (g // num_tiles, g % num_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, k2)
    return out[:, :h]


def _make_dw_ln_kernel(num_tiles: int, eps: float):
    """Double-buffered dwconv + bias + channel LayerNorm fusion."""

    def kernel(x_hbm, k_ref, bias_ref, scale_ref, beta_ref, out_ref, tiles, sems):
        _, th, w, _ = out_ref.shape
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

        acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
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

        # Channel LayerNorm fused in-register (saves a full HBM round trip
        # of the dwconv output).
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        centered = acc - mu
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        normed = centered * jax.lax.rsqrt(var + eps)
        out = normed * scale_ref[0, :].astype(jnp.float32) + beta_ref[
            0, :
        ].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _dw_ln_reference(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    eps: float,
) -> Array:
    """XLA composition ``LayerNorm(dwconv7x7(x) + bias)`` (bwd recompute)."""
    y = depthwise_conv7x7_reference(x, kernel) + bias
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.var(yf, axis=-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + eps) * ln_scale.astype(
        jnp.float32
    ) + ln_bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _make_dw_ln_bwd_kernel(num_tiles: int, eps: float):
    """Backward step for one (batch, h-tile): recompute conv+LN stats from
    the x halo tile, run the LayerNorm backward to get d_acc (grad at the
    conv+bias output), and accumulate the parameter grads. d_x is NOT
    computed here — it needs a d_acc halo across tile boundaries, so the
    caller runs the forward stencil once more on d_acc with the spatially
    flipped kernel (conv-transpose of a depthwise SAME conv)."""

    def kernel(
        x_hbm, k_ref, bias_ref, scale_ref, g_ref,
        dy_ref, dk_ref, dbias_ref, dscale_ref, dbeta_ref,
        tiles, sems,
    ):
        _, th, w, _ = dy_ref.shape
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

        # Recompute conv + bias (same stencil/loop order as the forward).
        acc = jnp.zeros(dy_ref.shape[1:], jnp.float32)
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

        # LN stats + backward (channel axis).
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        centered = acc - mu
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        yhat = centered * rstd

        gf = g_ref[0].astype(jnp.float32)
        dyhat = gf * scale_ref[0, :].astype(jnp.float32)
        da = rstd * (
            dyhat
            - jnp.mean(dyhat, axis=-1, keepdims=True)
            - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
        )
        dy_ref[0] = da.astype(dy_ref.dtype)

        dscale_part = jnp.sum(gf * yhat, axis=(0, 1)).reshape(1, -1)
        dbeta_part = jnp.sum(gf, axis=(0, 1)).reshape(1, -1)
        dbias_part = jnp.sum(da, axis=(0, 1)).reshape(1, -1)

        # d_kernel[dy,dx,c] = sum_{pixels} x_halo[r+dy, col+dx, c] * da[r, col, c].
        # One sublane (W) shift per dx; row (H) shifts are free.
        dk_rows = []
        for dx in range(KERNEL_SIZE):
            xs = tile[:, dx : dx + w, :].astype(jnp.float32)
            for dy in range(KERNEL_SIZE):
                dk_rows.append(
                    jnp.sum(xs[dy : dy + th, :, :] * da, axis=(0, 1))
                )
        # dk_rows[dx*7+dy] holds grad(dy, dx); emit dy-major rows [dy*7+dx]
        # to match kernel.reshape(49, C).
        dk_part = jnp.stack(
            [
                dk_rows[dx * KERNEL_SIZE + dy]
                for dy in range(KERNEL_SIZE)
                for dx in range(KERNEL_SIZE)
            ],
            axis=0,
        )

        @pl.when(g == 0)
        def _():
            dk_ref[:] = jnp.zeros_like(dk_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)
            dscale_ref[:] = jnp.zeros_like(dscale_ref)
            dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

        dk_ref[0:KERNEL_SIZE * KERNEL_SIZE, :] += dk_part
        dbias_ref[:] += dbias_part
        dscale_ref[:] += dscale_part
        dbeta_ref[:] += dbeta_part

    return kernel


def _dw_ln_bwd_pallas(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    g: Array,
    tile_h: int,
    eps: float,
    interpret: bool,
) -> tuple[Array, Array, Array, Array, Array]:
    """Pallas backward of the fused dwconv+LN.

    Returns (dx, dkernel[7,7,C], dbias, dscale, dbeta). Two pallas calls:
    the LN-backward stencil above, then the forward stencil on d_acc with
    the flipped kernel for dx.
    """
    b, h, w, c = x.shape
    padded_w = ((w + 2 * PAD + 7) // 8) * 8
    th = min(tile_h, h)
    while th > 8 and (th + 2 * PAD) * padded_w * c * 4 > 2 * 1024 * 1024:
        th //= 2
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th

    xp = jnp.pad(
        x,
        ((0, 0), (PAD, PAD + padded_h - h), (PAD, padded_w - w - PAD), (0, 0)),
    )
    # Zero-padding g zeroes the padded rows' contribution to every grad.
    gp = jnp.pad(g, ((0, 0), (0, padded_h - h), (0, 0), (0, 0)))
    k2 = kernel.reshape(KERNEL_SIZE * KERNEL_SIZE, c)
    nk = KERNEL_SIZE * KERNEL_SIZE
    nk_pad = ((nk + 7) // 8) * 8

    blk = pl.BlockSpec(
        (1, th, w, c),
        lambda gidx: (gidx // num_tiles, gidx % num_tiles, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda gidx: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    dy, dk, dbias, dscale, dbeta = pl.pallas_call(
        _make_dw_ln_bwd_kernel(num_tiles, eps),
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            fix((nk, c)),
            fix((1, c)),
            fix((1, c)),
            blk,
        ],
        out_specs=[blk, fix((nk_pad, c)), fix((1, c)), fix((1, c)), fix((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype),
            jax.ShapeDtypeStruct((nk_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, k2, bias.reshape(1, c), ln_scale.reshape(1, c), gp)

    # dx = SAME depthwise conv of d_acc with the spatially flipped kernel.
    k_flipped = kernel[::-1, ::-1, :]
    dx = depthwise_conv7x7(
        dy[:, :h], k_flipped, tile_h=tile_h, interpret=interpret
    )
    dkernel = dk[:nk].reshape(KERNEL_SIZE, KERNEL_SIZE, c)
    return dx, dkernel, dbias.reshape(-1), dscale.reshape(-1), dbeta.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _dw_ln_ad(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    tile_h: int,
    eps: float,
    interpret: bool,
) -> Array:
    """Differentiable fused dwconv+LN: forward AND backward are Pallas
    kernels (only the primal inputs are saved; the conv intermediate is
    recomputed in the backward stencil instead of round-tripping HBM, and
    d_x avoids XLA's slow grouped-conv transpose)."""
    return _dw_ln_pallas(x, kernel, bias, ln_scale, ln_bias, tile_h, eps, interpret)


def _dw_ln_fwd(x, kernel, bias, ln_scale, ln_bias, tile_h, eps, interpret):
    out = _dw_ln_pallas(x, kernel, bias, ln_scale, ln_bias, tile_h, eps, interpret)
    # ln_bias's VALUE is not needed by the backward, but carry the ([C])
    # array so the dbeta cotangent comes back in ln_bias's own dtype even
    # if ln_scale and ln_bias ever differ (round-2 advisor finding).
    return out, (x, kernel, bias, ln_scale, ln_bias)


def _dw_ln_bwd(tile_h, eps, interpret, saved, g):
    x, kernel, bias, ln_scale, ln_bias = saved
    dx, dkernel, dbias, dscale, dbeta = _dw_ln_bwd_pallas(
        x, kernel, bias, ln_scale, g, tile_h, eps, interpret
    )
    return (
        dx.astype(x.dtype),
        dkernel.astype(kernel.dtype),
        dbias.astype(bias.dtype),
        dscale.astype(ln_scale.dtype),
        dbeta.astype(ln_bias.dtype),
    )


_dw_ln_ad.defvjp(_dw_ln_fwd, _dw_ln_bwd)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret"))
def depthwise_conv7x7_ln(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    tile_h: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """Fused ``LayerNorm(dwconv7x7(x) + bias)`` (the ConvNeXt block prefix).

    Same stencil as :func:`depthwise_conv7x7` with the channel LayerNorm
    folded into the kernel, eliminating the intermediate dwconv output's
    HBM round trip that XLA's custom-call boundary would otherwise force.
    Differentiable: a custom VJP recomputes via the XLA reference in the
    backward pass (same pattern as ops.fused_mlp).
    """
    return _dw_ln_ad(x, kernel, bias, ln_scale, ln_bias, tile_h, eps, interpret)


def _dw_ln_pallas(
    x: Array,
    kernel: Array,
    bias: Array,
    ln_scale: Array,
    ln_bias: Array,
    tile_h: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """pallas_call dispatch for :func:`depthwise_conv7x7_ln` (no autodiff)."""
    b, h, w, c = x.shape
    padded_w = ((w + 2 * PAD + 7) // 8) * 8
    th = min(tile_h, h)
    while th > 8 and (th + 2 * PAD) * padded_w * c * 4 > 2 * 1024 * 1024:
        th //= 2
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th

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
        _make_dw_ln_kernel(num_tiles, eps),
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (KERNEL_SIZE * KERNEL_SIZE, c),
                lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c),
            lambda g: (g // num_tiles, g % num_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, k2, bias.reshape(1, c), ln_scale.reshape(1, c), ln_bias.reshape(1, c))
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
