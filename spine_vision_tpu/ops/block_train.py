"""Differentiable whole-block ConvNeXt kernel for TRAINING.

Round-3 train-step analysis (AGENTS.md): the 7x7 depthwise conv is
VPU-roofline-bound in XLA (~15 ms fwd + ~23 ms bwd per ConvNeXt-base@512 b32
step) while the Pallas LN-MLP kernels keep the MXU busy (~108 ms). The only
way to make the dwconv cheaper is to hide its VPU work under the MXU —
exactly what the inference megakernel (ops.convnext_block) proved for the
forward. This module makes that structure trainable:

- forward: the existing megakernel (dwconv+bias+LN+MLP+LayerScale+residual,
  ONE x read + ONE out write, ops.convnext_block._block_pallas).
- backward: ONE new Pallas kernel per block that
    * DMAs the padded x tile + conv halo (the residual/dwconv input),
    * recomputes u = dwconv(x)+bias and the LayerNorm ONCE per tile into
      VMEM scratch (the round-2 kernel re-derived LN per H-chunk),
    * runs the H-chunked MLP backward (hidden recomputed in VMEM),
    * applies the LayerNorm backward and emits g_u (the dwconv-output
      cotangent) in the input dtype,
    * folds the depthwise WEIGHT grad in as a 49-tap correlate of the
      halo tile with g_u (VPU work scheduled under the 5 matmuls),
  leaving exactly one XLA op outside: the data grad
  dx = g + conv(g_u, rot180(k)) — a forward-shaped grouped conv.

Covers the ConvNeXt block bodies the reference consumes via timm
(training/models/backbone.py:25-85); the fused training path is a TPU
design choice with no reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spine_vision_tpu.ops.convnext_block import _block_pallas
from spine_vision_tpu.ops.dwconv import KERNEL_SIZE, PAD
from spine_vision_tpu.ops.fused_mlp import MAX_FUSED_DIM, _gelu_and_grad

_LN_EPS = 1e-6
# 49 taps padded to a sublane multiple for the (taps, C) f32 grad block.
_TAPS_PADDED = 56

# H-chunk width of the MLP backward per channel width (VMEM sizing: w1/w2
# chunks + f32 hidden temps + the resident dw1/dw2 accumulators).
_BWD_HCHUNK = {128: 512, 256: 1024, 512: 256}
# Rows per backward tile. At C=512 the resident dw1/dw2 f32 accumulators
# already cost 8 MB of the 16 MB VMEM, so every tile-sized buffer must
# shrink: th=4 AND hc=256 together are required for the compile to fit
# (th=8/hc=512, th=8/hc=256, th=4/hc=512 all OOM the compile helper —
# probed, scripts/probe_block_train_compile.py).
_BWD_TILE_H = {128: 8, 256: 8, 512: 4}


def _make_bwd_kernel(num_tiles: int, eps: float):
    def kernel(
        # inputs
        xp_hbm, gy_ref, k2_ref, dwb_ref, ls_ref, lb_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
        # outputs
        gu_ref, dwk_ref, ddwb_ref, dls_ref, dlb_ref,
        dw1_ref, db1_ref, dw2_ref, db2_ref, dgamma_ref,
        # scratch
        tiles, sems, yhat_s, rstd_s, acc_ref,
    ):
        g = pl.program_id(0)
        j = pl.program_id(1)
        total_g = pl.num_programs(0)
        num_h = pl.num_programs(1)
        _, th, w, c = gy_ref.shape
        hc = w1_ref.shape[1]
        tm = th * w

        def start_dma(step, slot):
            i = step // num_tiles
            jt = step % num_tiles
            return pltpu.make_async_copy(
                xp_hbm.at[i, pl.ds(jt * th, th + 2 * PAD), :, :],
                tiles.at[slot],
                sems.at[slot],
            )

        @pl.when(jnp.logical_and(g == 0, j == 0))
        def _():
            start_dma(0, 0).start()

        # Once per tile: land the halo tile, recompute dwconv + LayerNorm.
        @pl.when(j == 0)
        def _():
            @pl.when(g + 1 < total_g)
            def _():
                start_dma(g + 1, (g + 1) % 2).start()

            start_dma(g, g % 2).wait()
            tile = tiles[g % 2]
            conv = jnp.zeros((th, w, c), jnp.float32)
            for dxs in range(KERNEL_SIZE):
                col = tile[0:th, :, :].astype(jnp.float32) * k2_ref[
                    dxs, :
                ].astype(jnp.float32)
                for dy in range(1, KERNEL_SIZE):
                    col = col + tile[dy : dy + th, :, :].astype(
                        jnp.float32
                    ) * k2_ref[dy * KERNEL_SIZE + dxs, :].astype(jnp.float32)
                conv = conv + col[:, dxs : dxs + w, :]
            u = (conv + dwb_ref[0, :].astype(jnp.float32)).reshape(tm, c)
            mu = jnp.mean(u, axis=-1, keepdims=True)
            centered = u - mu
            var = jnp.mean(centered * centered, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
            yhat_s[:] = centered * rstd
            rstd_s[:] = rstd

        # H-chunked MLP backward (same math as fused_mlp._ln_mlp_bwd_kernel,
        # with the LN recompute replaced by the per-tile scratch).
        yhat = yhat_s[:]
        ls = ls_ref[0, :].astype(jnp.float32)
        y = yhat * ls + lb_ref[0, :].astype(jnp.float32)
        y_lp = y.astype(gu_ref.dtype)
        gf = gy_ref[0].reshape(tm, c).astype(jnp.float32)

        hpre = jnp.dot(y_lp, w1_ref[:], preferred_element_type=jnp.float32)
        hpre = hpre + b1_ref[0, :].astype(jnp.float32)
        h, dgelu = _gelu_and_grad(hpre)
        h_lp = h.astype(gu_ref.dtype)

        gamma_f = gamma_ref[0, :].astype(jnp.float32)
        g_mlp = (gf * gamma_f).astype(gu_ref.dtype)

        g_h = jax.lax.dot_general(
            g_mlp, w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_hpre_f = g_h * dgelu
        g_hpre = g_hpre_f.astype(gu_ref.dtype)

        g_y_part = jax.lax.dot_general(
            g_hpre, w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw1_part = jax.lax.dot_general(
            y_lp, g_hpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a_part = jax.lax.dot_general(
            h_lp, gf.astype(gu_ref.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw2_part = a_part * gamma_f[None, :]
        dgamma_part = jnp.sum(
            w2_ref[:].astype(jnp.float32) * a_part, axis=0, keepdims=True
        )
        db1_part = jnp.sum(g_hpre_f, axis=0, keepdims=True)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = g_y_part

        @pl.when(j > 0)
        def _():
            acc_ref[:] += g_y_part

        @pl.when(g == 0)
        def _():
            dw1_ref[:, pl.ds(j * hc, hc)] = dw1_part
            db1_ref[:, pl.ds(j * hc, hc)] = db1_part
            dw2_ref[pl.ds(j * hc, hc), :] = dw2_part

        @pl.when(g > 0)
        def _():
            dw1_ref[:, pl.ds(j * hc, hc)] += dw1_part
            db1_ref[:, pl.ds(j * hc, hc)] += db1_part
            dw2_ref[pl.ds(j * hc, hc), :] += dw2_part

        db2_part = jnp.sum(gf * gamma_f, axis=0, keepdims=True)
        dgamma_b2 = jnp.sum(gf, axis=0, keepdims=True) * b2_ref[0, :].astype(
            jnp.float32
        )
        first = jnp.logical_and(g == 0, j == 0)

        @pl.when(first)
        def _():
            db2_ref[:] = db2_part
            dgamma_ref[:] = dgamma_part + dgamma_b2

        @pl.when(jnp.logical_and(j == 0, g > 0))
        def _():
            db2_ref[:] += db2_part
            dgamma_ref[:] += dgamma_part + dgamma_b2

        @pl.when(j > 0)
        def _():
            dgamma_ref[:] += dgamma_part

        # Last chunk: LayerNorm backward, g_u emission, depthwise grads.
        @pl.when(j == num_h - 1)
        def _():
            g_y = acc_ref[:]
            dls_part = jnp.sum(g_y * yhat, axis=0, keepdims=True)
            dlb_part = jnp.sum(g_y, axis=0, keepdims=True)
            dyhat = g_y * ls
            g_u = rstd_s[:] * (
                dyhat
                - jnp.mean(dyhat, axis=-1, keepdims=True)
                - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
            )
            gu_ref[0] = g_u.reshape(th, w, c).astype(gu_ref.dtype)

            @pl.when(g == 0)
            def _():
                dls_ref[:] = dls_part
                dlb_ref[:] = dlb_part

            @pl.when(g > 0)
            def _():
                dls_ref[:] += dls_part
                dlb_ref[:] += dlb_part

            # Depthwise weight grad: 49-tap correlation of the halo tile
            # (still resident — the next tile's DMA targets the OTHER slot)
            # with g_u. dk[dy*7+dx, c] = sum_{y,x} xp[y+dy, x+dx, c] g_u[y,x, c].
            tile = tiles[g % 2]
            gu3 = g_u.reshape(th, w, c)
            # Sublane (W) shifts are the expensive relayouts — do ONE per
            # dx (7 total, like the forward stencil) and take the free
            # major-dim (H) slices inside.
            rows = [None] * (KERNEL_SIZE * KERNEL_SIZE)
            for dxs in range(KERNEL_SIZE):
                tile_dx = tile[:, dxs : dxs + w, :].astype(jnp.float32)
                for dy in range(KERNEL_SIZE):
                    prod = tile_dx[dy : dy + th] * gu3
                    # Keep reductions 2-D for Mosaic: (th*w, c) -> (1, c).
                    rows[dy * KERNEL_SIZE + dxs] = jnp.sum(
                        prod.reshape(th * w, c), axis=0, keepdims=True
                    )
            dwk_part = jnp.concatenate(
                rows
                + [
                    jnp.zeros(
                        (_TAPS_PADDED - KERNEL_SIZE * KERNEL_SIZE, c),
                        jnp.float32,
                    )
                ],
                axis=0,
            )
            ddwb_part = jnp.sum(g_u, axis=0, keepdims=True)

            @pl.when(g == 0)
            def _():
                dwk_ref[:] = dwk_part
                ddwb_ref[:] = ddwb_part

            @pl.when(g > 0)
            def _():
                dwk_ref[:] += dwk_part
                ddwb_ref[:] += ddwb_part

    return kernel


def _block_train_bwd_pallas(
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
    g: Array,
    eps: float,
    interpret: bool,
) -> tuple[Array, ...]:
    b, h, w, c = x.shape
    hd = w1.shape[1]
    hc = _BWD_HCHUNK.get(c, 512)
    if hd % hc != 0:
        hc = hd
    num_h = hd // hc
    th = min(_BWD_TILE_H.get(c, 4), h)
    num_tiles = (h + th - 1) // th
    padded_h = num_tiles * th
    padded_w = ((w + 2 * PAD + 7) // 8) * 8

    xp = jnp.pad(
        x,
        ((0, 0), (PAD, PAD + padded_h - h), (PAD, padded_w - w - PAD), (0, 0)),
    )
    gp = (
        jnp.pad(g, ((0, 0), (0, padded_h - h), (0, 0), (0, 0)))
        if padded_h != h
        else g
    )
    k2 = jnp.pad(
        kernel.reshape(KERNEL_SIZE * KERNEL_SIZE, c),
        ((0, _TAPS_PADDED - KERNEL_SIZE * KERNEL_SIZE), (0, 0)),
    )

    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda gq, jq: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    tile_spec = pl.BlockSpec(
        (1, th, w, c),
        lambda gq, jq: (gq // num_tiles, gq % num_tiles, 0, 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        _make_bwd_kernel(num_tiles, eps),
        grid=(b * num_tiles, num_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x, DMA'd with halo
            tile_spec,  # g_y
            fix((_TAPS_PADDED, c)),
            fix((1, c)),
            fix((1, c)),
            fix((1, c)),
            pl.BlockSpec(
                (c, hc), lambda gq, jq: (0, jq), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hc), lambda gq, jq: (0, jq), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (hc, c), lambda gq, jq: (jq, 0), memory_space=pltpu.VMEM
            ),
            fix((1, c)),
            fix((1, c)),
        ],
        out_specs=[
            tile_spec,  # g_u
            fix((_TAPS_PADDED, c)),
            fix((1, c)),
            fix((1, c)),
            fix((1, c)),
            fix((c, hd)),
            fix((1, hd)),
            fix((hd, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, padded_h, w, c), x.dtype),
            jax.ShapeDtypeStruct((_TAPS_PADDED, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, hd), jnp.float32),
            jax.ShapeDtypeStruct((1, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * PAD, padded_w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((th * w, c), jnp.float32),
            pltpu.VMEM((th * w, 1), jnp.float32),
            pltpu.VMEM((th * w, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        xp,
        gp,
        k2,
        bias.reshape(1, c),
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1,
        b1.reshape(1, hd),
        w2,
        b2.reshape(1, c),
        gamma.reshape(1, c),
    )
    (g_u, dwk, ddwb, dls, dlb, dw1, db1, dw2, db2, dgamma) = outs
    return (
        g_u[:, :h],
        dwk[: KERNEL_SIZE * KERNEL_SIZE].reshape(KERNEL_SIZE, KERNEL_SIZE, c),
        ddwb,
        dls,
        dlb,
        dw1,
        db1,
        dw2,
        db2,
        dgamma,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _block_train_ad(
    x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    tile_h, eps, interpret,
):
    return _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )


def _block_train_fwd(x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2,
                     gamma, tile_h, eps, interpret):
    out = _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )
    return out, (x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _block_train_bwd(tile_h, eps, interpret, saved, g):
    x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma = saved
    c = x.shape[-1]
    (g_u, dk, ddwb, dls, dlb, dw1, db1, dw2, db2, dgamma) = (
        _block_train_bwd_pallas(
            x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g,
            eps, interpret,
        )
    )
    # Data grad: the adjoint of a stride-1 SAME depthwise conv is the same
    # conv with the spatially flipped kernel — a forward-shaped grouped conv
    # XLA runs at its VPU roofline; the residual cotangent rides the fused add.
    flipped = kernel[::-1, ::-1, :].reshape(KERNEL_SIZE, KERNEL_SIZE, 1, c)
    dx_conv = jax.lax.conv_general_dilated(
        g_u,
        flipped.astype(g_u.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    dx = (g.astype(jnp.float32) + dx_conv.astype(jnp.float32)).astype(x.dtype)
    return (
        dx,
        dk.astype(kernel.dtype),
        ddwb.reshape(bias.shape).astype(bias.dtype),
        dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
    )


_block_train_ad.defvjp(_block_train_fwd, _block_train_bwd)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret"))
def convnext_block_train(
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
    """Trainable fused ConvNeXt block:
    ``x + gamma * mlp(LayerNorm(dwconv7x7(x) + bias))``.

    Forward = the inference megakernel (one x read, one out write);
    backward = one Pallas kernel producing g_u + ALL param grads, plus a
    single XLA grouped conv for the data grad. See the module docstring for
    why this beats XLA's dwconv gradients on TPU.

    Args/returns match :func:`ops.convnext_block.convnext_block_fused`.
    """
    if x.shape[-1] > MAX_FUSED_DIM:
        raise ValueError(
            f"C={x.shape[-1]} exceeds MAX_FUSED_DIM={MAX_FUSED_DIM}; use the "
            "XLA fallback path."
        )
    return _block_train_ad(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )


# --------------------------------------------------------------------------
# Hybrid: megakernel FORWARD (emitting the conv intermediate), the winning
# COMPOSED backward (resident LN-MLP backward kernel + XLA conv gradients).
#
# The all-Pallas backward above LOSES to the composed path (AGENTS.md
# round-3 negative result: resident f32 dw accumulators force th=4/hc=256
# tiles at C=512 and MXU efficiency collapses; C=128/256 are streaming-bound
# with no MXU shadow for the 49-tap VPU work). This variant changes ONLY the
# forward: one kernel reads x once (the DMA'd conv halo doubles as the
# residual), hides the dwconv's VPU stencil under the MLP matmuls, and
# writes y plus t = dwconv(x)+bias. Versus the composed forward (XLA conv:
# read x, write t; LN-MLP kernel: read t, read x, write y) it deletes two
# full activation streams per block. The backward is byte-for-byte the
# composed path: the LN/hidden recompute reads the SAME bf16-rounded t the
# forward's LayerNorm consumed, and dx/dk ride XLA's grouped-conv gradients.
# --------------------------------------------------------------------------


def _conv_ref(x: Array, kernel: Array) -> Array:
    """The depthwise conv whose XLA gradients the hybrid backward reuses
    (identical to the nn.Conv the composed path differentiates)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        kernel.reshape(KERNEL_SIZE, KERNEL_SIZE, 1, c).astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _block_hybrid_ad(
    x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    tile_h, eps, interpret,
):
    out, _ = _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret, emit_conv=True,
    )
    return out


def _block_hybrid_fwd(x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2,
                      gamma, tile_h, eps, interpret):
    out, t = _block_pallas(
        x, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret, emit_conv=True,
    )
    return out, (x, t, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _block_hybrid_bwd(tile_h, eps, interpret, saved, g):
    from spine_vision_tpu.ops.fused_mlp import _ln_mlp_bwd_pallas

    x, t, kernel, bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma = saved
    dt, dls, dlb, dw1, db1, dw2, db2, dgamma = _ln_mlp_bwd_pallas(
        t, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g, interpret
    )
    dt = dt.astype(x.dtype)
    # XLA's own grouped-conv gradients (the composed path's winners): the
    # primal conv below is dead code under jit (conv VJPs don't use it).
    _, conv_vjp = jax.vjp(_conv_ref, x, kernel)
    dx_conv, dk = conv_vjp(dt)
    dbias = jnp.sum(dt.astype(jnp.float32), axis=(0, 1, 2))
    dx = (dx_conv.astype(jnp.float32) + g.astype(jnp.float32)).astype(x.dtype)
    return (
        dx,
        dk.astype(kernel.dtype),
        dbias.reshape(bias.shape).astype(bias.dtype),
        dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
    )


_block_hybrid_ad.defvjp(_block_hybrid_fwd, _block_hybrid_bwd)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret"))
def convnext_block_hybrid(
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
    """Trainable fused ConvNeXt block, hybrid strategy:
    ``x + gamma * mlp(LayerNorm(dwconv7x7(x) + bias))``.

    Forward = the inference megakernel emitting ``(y, t)`` (one x read;
    the dwconv VPU stencil hides under the MLP matmuls); backward = the
    composed winner (resident LN-MLP backward kernel from ``t`` + XLA
    grouped-conv gradients). Args/returns match
    :func:`ops.convnext_block.convnext_block_fused`.
    """
    if x.shape[-1] > MAX_FUSED_DIM:
        raise ValueError(
            f"C={x.shape[-1]} exceeds MAX_FUSED_DIM={MAX_FUSED_DIM}; use the "
            "XLA fallback path."
        )
    return _block_hybrid_ad(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        tile_h, eps, interpret,
    )
