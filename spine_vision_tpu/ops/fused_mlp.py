"""Fused ConvNeXt-block MLP: ``gelu(x @ w1 + b1) @ w2 + b2`` in one kernel.

The block MLP's hidden activation ([tokens, 4C]) is 4x the block's working
set; XLA writes it to HBM between the two matmuls. Keeping it in VMEM while
both weight matrices stay resident removes that round trip (the dominant
non-matmul cost of the bandwidth-bound ConvNeXt forward — see AGENTS.md).
The kernel optionally absorbs the rest of the ConvNeXt block tail —
LayerScale ``gamma`` and the residual add — so no standalone elementwise
pass is left behind the custom call (AGENTS.md: Pallas kernels must absorb
their fusion neighborhood or they regress in-model).

Measured on v5e (ConvNeXt-base @ 512², batch 32, bf16, MLP alone):
C=128: 7.7 -> 5.2 ms; C=256: 5.5 -> 4.1 ms; C=512: 4.2 -> 3.7 ms.

Grid is over token tiles; both weights load as full VMEM blocks, so the
kernel is limited to hidden sizes whose weights fit (C <= 512 -> w1+w2 4 MB
bf16; the C=1024 stage falls back to XLA).

Covers the pointwise-MLP half of the reference's ConvNeXt blocks (consumed
via timm, training/models/backbone.py:25-85).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Weight VMEM budget: C=512 -> 2*(512*2048*2B) = 4 MB. Above this, fall back.
MAX_FUSED_DIM = 512

# Fastest measured token tile per channel width (v5e, see module docstring).
# C=512 capped at 512: the [tm, 4C] f32 hidden + activation temps + 4 MB
# weights push the tile-1024 working set over the 16 MB scoped-vmem limit.
_BEST_TILE_M = {128: 1024, 256: 2048, 512: 512}


_GELU_C = math.sqrt(2.0 / math.pi)
_GELU_A = 0.044715


def _tanh_gelu(x: Array) -> Array:
    """tanh-approximate GELU (Hendrycks & Gimpel), the framework-wide
    activation for the ConvNeXt MLP (kernels AND the XLA model path use
    ``approximate=True`` so the paths stay interchangeable).

    Why tanh and not exact erf: Mosaic lowers neither erf nor erfc, and the
    A&S 7.1.26 rational erf costs real VPU time — measured +2.3 ms per
    268M-element pass at the stage-1 hidden shape vs +0.1 ms for tanh
    (scripts/probe_gelu_cost.py; tanh hits the hardware transcendental
    unit). The tanh/erf deviation (<1e-3 absolute) is below bf16 rounding
    in the compute dtype, so pretrained-weight parity is unaffected.
    """
    u = _GELU_C * (x + _GELU_A * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_and_grad(x: Array) -> tuple[Array, Array]:
    """(gelu(x), gelu'(x)) sharing one tanh evaluation (f32 in/out).

    With t = tanh(u), u = c*(x + a*x^3): gelu = 0.5*x*(1+t) and
    gelu' = 0.5*(1+t) + 0.5*x*(1-t^2)*c*(1+3a*x^2).
    """
    x2 = x * x
    u = _GELU_C * (x + _GELU_A * x * x2)
    t = jnp.tanh(u)
    half_1pt = 0.5 * (1.0 + t)
    du = _GELU_C * (1.0 + 3.0 * _GELU_A * x2)
    return x * half_1pt, half_1pt + 0.5 * x * (1.0 - t * t) * du


def _mlp_core(x_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, :].astype(jnp.float32)
    h = _tanh_gelu(h).astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    return out + b2_ref[0, :].astype(jnp.float32)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    out_ref[:] = _mlp_core(x_ref, w1_ref, b1_ref, w2_ref, b2_ref).astype(
        out_ref.dtype
    )


def _mlp_tail_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, res_ref, out_ref
):
    out = _mlp_core(x_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    out = out * gamma_ref[0, :].astype(jnp.float32)
    out = out + res_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_mlp(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array | None,
    residual: Array | None,
    tile_m: int | None,
    interpret: bool,
) -> Array:
    """Dispatch to the pallas_call (no autodiff). See fused_mlp."""
    m, c = x.shape
    h = w1.shape[1]
    if tile_m is None:
        tile_m = _BEST_TILE_M.get(c, 1024)
    tm = min(tile_m, m)
    num_tiles = (m + tm - 1) // tm
    padded_m = num_tiles * tm
    if padded_m != m:
        x = jnp.pad(x, ((0, padded_m - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, padded_m - m), (0, 0)))

    tok_spec = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        tok_spec,
        pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w1, b1.reshape(1, h), w2, b2.reshape(1, c)]
    if gamma is not None or residual is not None:
        kernel = _mlp_tail_kernel
        in_specs.append(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(tok_spec)
        args.append(
            (gamma if gamma is not None else jnp.ones((c,), x.dtype)).reshape(1, c)
        )
        args.append(residual if residual is not None else jnp.zeros_like(x))
    else:
        kernel = _mlp_kernel

    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((padded_m, c), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:m]


# Backward token tile / H chunk per channel width. Chunking H keeps the
# weight blocks + f32 weight-grad accumulators + activation temps inside
# VMEM at C=512 (w1+w2 1 MB resident per chunk, dw1+dw2 8 MB accumulated
# in the revisited output blocks). C=512 tm=512 measures 6% faster in
# isolation (tune_mlp_bwd.py) but OOMs the compile-helper when embedded in
# the full train step — keep 256.
_BWD_TILE_M = {128: 1024, 256: 512, 512: 256}
_BWD_HCHUNK = {128: 512, 256: 1024, 512: 512}


def _mlp_bwd_kernel(
    x_ref,
    g_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    gamma_ref,
    dx_ref,
    dw1_ref,
    db1_ref,
    dw2_ref,
    db2_ref,
    dgamma_ref,
    acc_ref,
):
    """One (token-tile i, H-chunk j) backward step.

    Grid is (num_token_tiles, num_h_chunks) with j innermost, so the
    fixed-index accumulator outputs (dw1/db1/dw2/db2/dgamma) are revisited
    on consecutive steps and stay VMEM-resident; each step recomputes its
    hidden chunk from x so nothing hidden-sized ever touches HBM (the point
    of the kernel: XLA's backward round-trips the 4C-wide hidden twice).
    dx accumulates across H chunks in the f32 VMEM scratch and is written
    once per token tile in the input dtype (bf16-sized HBM write, no
    trailing XLA convert pass).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    num_h = pl.num_programs(1)
    hc = w1_ref.shape[1]

    x = x_ref[:]
    gf = g_ref[:].astype(jnp.float32)

    # Recompute this H chunk of the hidden (checkpoint-style).
    hpre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[0, :].astype(jnp.float32)
    h, dgelu = _gelu_and_grad(hpre)
    h_lp = h.astype(x.dtype)

    gamma_f = gamma_ref[0, :].astype(jnp.float32)
    g_mlp_f = gf * gamma_f
    g_mlp = g_mlp_f.astype(x.dtype)

    g_h = jax.lax.dot_general(
        g_mlp, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g_hpre_f = g_h * dgelu
    g_hpre = g_hpre_f.astype(x.dtype)

    dx_part = jax.lax.dot_general(
        g_hpre, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1_part = jax.lax.dot_general(
        x, g_hpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # A = h^T @ g (UNSCALED cotangent). dw2 = A * gamma (column scale), and
    # dgamma's h@w2 term folds into sum_h w2 .* A — a VPU multiply-reduce
    # instead of recomputing out_mlp with a 6th matmul per step.
    a_part = jax.lax.dot_general(
        h_lp, gf.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_part = a_part * gamma_f[None, :]
    dgamma_part = jnp.sum(
        w2_ref[:].astype(jnp.float32) * a_part, axis=0, keepdims=True
    )
    db1_part = jnp.sum(g_hpre_f, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = dx_part

    @pl.when(j > 0)
    def _():
        acc_ref[:] += dx_part

    @pl.when(j == num_h - 1)
    def _():
        dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:, pl.ds(j * hc, hc)] = dw1_part
        db1_ref[:, pl.ds(j * hc, hc)] = db1_part
        dw2_ref[pl.ds(j * hc, hc), :] = dw2_part

    @pl.when(i > 0)
    def _():
        dw1_ref[:, pl.ds(j * hc, hc)] += dw1_part
        db1_ref[:, pl.ds(j * hc, hc)] += db1_part
        dw2_ref[pl.ds(j * hc, hc), :] += dw2_part

    # db2 and the b2 term of dgamma are H-independent: add once per i.
    db2_part = jnp.sum(g_mlp_f, axis=0, keepdims=True)
    dgamma_b2 = jnp.sum(gf, axis=0, keepdims=True) * b2_ref[0, :].astype(
        jnp.float32
    )
    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        db2_ref[:] = db2_part
        dgamma_ref[:] = dgamma_part + dgamma_b2

    @pl.when(jnp.logical_and(j == 0, i > 0))
    def _():
        db2_ref[:] += db2_part
        dgamma_ref[:] += dgamma_part + dgamma_b2

    @pl.when(j > 0)
    def _():
        dgamma_ref[:] += dgamma_part


def _mlp_bwd_pallas(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    g: Array,
    interpret: bool,
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Pallas backward of the fused MLP tail (d_residual = g, by caller).

    Returns (dx, dw1, db1, dw2, db2, dgamma); dx and the weight grads are
    f32 (chunk-accumulated), cast to primal dtypes by the VJP wrapper.
    """
    m, c = x.shape
    h = w1.shape[1]
    tm = min(_BWD_TILE_M.get(c, 256), m)
    hc = _BWD_HCHUNK.get(c, 512)
    if h % hc != 0:
        hc = h
    num_tiles = (m + tm - 1) // tm
    padded_m = num_tiles * tm
    if padded_m != m:
        # Zero-padding g zeroes every padded row's grad contribution.
        x = jnp.pad(x, ((0, padded_m - m), (0, 0)))
        g = jnp.pad(g, ((0, padded_m - m), (0, 0)))
    num_h = h // hc
    # dx accumulates in an f32 VMEM scratch across H chunks and is written
    # once per token tile in the input dtype: bf16-sized HBM write, exact
    # f32 summation, and no trailing XLA convert pass.
    dx_dtype = x.dtype

    tok = pl.BlockSpec((tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    dx_spec = pl.BlockSpec((tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(num_tiles, num_h),
        in_specs=[
            tok,
            tok,
            pl.BlockSpec((c, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            fix((1, c)),
            fix((1, c)),
        ],
        out_specs=[
            dx_spec,
            fix((c, h)),
            fix((1, h)),
            fix((h, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_m, c), dx_dtype),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        interpret=interpret,
    )(x, g, w1, b1.reshape(1, h), w2, b2.reshape(1, c), gamma.reshape(1, c))
    dx, dw1, db1, dw2, db2, dgamma = outs
    return dx[:m], dw1, db1, dw2, db2, dgamma


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp_ad(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    residual: Array,
    tile_m: int | None,
    interpret: bool,
) -> Array:
    """Differentiable fused MLP tail: forward AND backward are Pallas
    kernels (checkpoint-style: only the primal inputs are saved; the 4C
    hidden is recomputed chunk-wise in VMEM by the backward kernel, so it
    never round-trips HBM in either direction)."""
    return _pallas_mlp(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret):
    out = _pallas_mlp(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret)
    return out, (x, w1, b1, w2, b2, gamma, residual)


def _fused_mlp_bwd(tile_m, interpret, saved, g):
    x, w1, b1, w2, b2, gamma, residual = saved
    dx, dw1, db1, dw2, db2, dgamma = _mlp_bwd_pallas(
        x, w1, b1, w2, b2, gamma, g, interpret
    )
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
        g.astype(residual.dtype),
    )


_fused_mlp_ad.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_mlp_plain_ad(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    tile_m: int | None,
    interpret: bool,
) -> Array:
    """Differentiable no-tail fused MLP (same fwd+bwd Pallas contract as
    the tail variant, without streaming a zeros residual)."""
    return _pallas_mlp(x, w1, b1, w2, b2, None, None, tile_m, interpret)


def _fused_mlp_plain_fwd(x, w1, b1, w2, b2, tile_m, interpret):
    out = _pallas_mlp(x, w1, b1, w2, b2, None, None, tile_m, interpret)
    return out, (x, w1, b1, w2, b2)


def _fused_mlp_plain_bwd(tile_m, interpret, saved, g):
    x, w1, b1, w2, b2 = saved
    ones = jnp.ones((x.shape[1],), jnp.float32)
    dx, dw1, db1, dw2, db2, _ = _mlp_bwd_pallas(x, w1, b1, w2, b2, ones, g, interpret)
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
    )


_fused_mlp_plain_ad.defvjp(_fused_mlp_plain_fwd, _fused_mlp_plain_bwd)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_mlp(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array | None = None,
    residual: Array | None = None,
    tile_m: int | None = None,
    interpret: bool = False,
) -> Array:
    """``gelu(x @ w1 + b1) @ w2 + b2``, hidden kept in VMEM.

    With ``gamma``/``residual`` the full ConvNeXt block tail is absorbed:
    ``residual + gamma * mlp(x)`` (gamma defaults to ones, residual to zero —
    both must be given together in the block use-case but are independent).

    Args:
        x: [M, C] tokens (any leading shape flattened by the caller).
        w1: [C, H]; b1: [H]; w2: [H, C]; b2: [C].
        gamma: optional [C] LayerScale.
        residual: optional [M, C] tensor added to the (scaled) output.
        tile_m: Tokens per grid step; defaults to the measured-best for C.
        interpret: Interpreter mode (CPU tests).

    Returns:
        [M, C], dtype of ``x``.
    """
    if x.shape[1] > MAX_FUSED_DIM:
        # Weights would not fit VMEM (scoped-vmem OOM) — XLA composition.
        return mlp_reference(x, w1, b1, w2, b2, gamma, residual)
    if gamma is not None or residual is not None:
        # Differentiable tail variant (custom VJP, backward recomputes).
        c = x.shape[1]
        return _fused_mlp_ad(
            x,
            w1,
            b1,
            w2,
            b2,
            gamma if gamma is not None else jnp.ones((c,), x.dtype),
            residual if residual is not None else jnp.zeros_like(x),
            tile_m,
            interpret,
        )
    return _fused_mlp_plain_ad(x, w1, b1, w2, b2, tile_m, interpret)


# ---------------------------------------------------------------------------
# LayerNorm-fused variant: LN(x) -> MLP -> LayerScale -> +residual, one kernel
# each direction. Removes the standalone XLA LayerNorm forward AND backward
# passes per block in training (the trace showed them as convert_reduce /
# conv fusions trailing each Pallas boundary).
# ---------------------------------------------------------------------------

_LN_EPS = 1e-6


def _ln_rows(xf: Array) -> tuple[Array, Array]:
    """Per-row LayerNorm stats over the channel axis: (yhat, rstd)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mu
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    return centered * rstd, rstd


def _ln_mlp_tail_kernel(
    x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, res_ref,
    out_ref,
):
    # Rank-agnostic: blocks are (tm, c) in the flat path or (1, th, w, c)
    # in the NHWC path (which avoids the XLA layout copy an [B,H,W,C] ->
    # [M,C] reshape costs at the custom-call boundary on TPU).
    c = x_ref.shape[-1]
    yhat, _ = _ln_rows(x_ref[...].reshape(-1, c).astype(jnp.float32))
    y = yhat * ls_ref[0, :].astype(jnp.float32) + lb_ref[0, :].astype(jnp.float32)
    y_lp = y.astype(x_ref.dtype)
    h = jnp.dot(y_lp, w1_ref[:], preferred_element_type=jnp.float32)
    h = _tanh_gelu(h + b1_ref[0, :].astype(jnp.float32)).astype(x_ref.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[0, :].astype(jnp.float32)
    out = out * gamma_ref[0, :].astype(jnp.float32)
    out = out + res_ref[...].reshape(-1, c).astype(jnp.float32)
    out_ref[...] = out.reshape(out_ref.shape).astype(out_ref.dtype)


def _nhwc_tiles(x: Array, target_tokens: int) -> tuple[int, int]:
    """(rows per tile, tile count) so th*W tokens approximate the tuned
    2-D token tile for this channel width."""
    _, hh, ww, _ = x.shape
    th = max(1, min(hh, max(1, target_tokens // ww)))
    return th, (hh + th - 1) // th


def _ln_mlp_pallas(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    residual: Array,
    tile_m: int | None,
    interpret: bool,
) -> Array:
    c = x.shape[-1]
    h = w1.shape[1]
    if tile_m is None:
        tile_m = _BEST_TILE_M.get(c, 1024)

    orig_h = x.shape[1] if x.ndim == 4 else None
    if x.ndim == 4:
        # NHWC path: tile (batch, row-slab) blocks so no [B,H,W,C]->[M,C]
        # reshape (an XLA layout copy on TPU) surrounds the custom call.
        b, hh, ww, _ = x.shape
        th, num_tiles = _nhwc_tiles(x, tile_m)
        padded_h = num_tiles * th
        if padded_h != hh:
            pad = ((0, 0), (0, padded_h - hh), (0, 0), (0, 0))
            x = jnp.pad(x, pad)
            residual = jnp.pad(residual, pad)
        tok = pl.BlockSpec(
            (1, th, ww, c),
            lambda i: (i // num_tiles, i % num_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        )
        grid = (b * num_tiles,)
        out_shape = jax.ShapeDtypeStruct((b, padded_h, ww, c), x.dtype)
    else:
        m = x.shape[0]
        tm = min(tile_m, m)
        num_tiles = (m + tm - 1) // tm
        padded_m = num_tiles * tm
        if padded_m != m:
            x = jnp.pad(x, ((0, padded_m - m), (0, 0)))
            residual = jnp.pad(residual, ((0, padded_m - m), (0, 0)))
        tok = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        grid = (num_tiles,)
        out_shape = jax.ShapeDtypeStruct((padded_m, c), x.dtype)

    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _ln_mlp_tail_kernel,
        grid=grid,
        in_specs=[
            tok,
            fix((1, c)),
            fix((1, c)),
            fix((c, h)),
            fix((1, h)),
            fix((h, c)),
            fix((1, c)),
            fix((1, c)),
            tok,
        ],
        out_specs=tok,
        out_shape=out_shape,
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1,
        b1.reshape(1, h),
        w2,
        b2.reshape(1, c),
        gamma.reshape(1, c),
        residual,
    )
    if out.ndim == 4:
        return out[:, :orig_h]
    return out[:m]


def _ln_mlp_bwd_kernel(
    x_ref, g_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
    dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dgamma_ref,
    acc_ref,
):
    """One (token-tile i, H-chunk j) backward step of the LN-fused MLP.

    Same structure as :func:`_mlp_bwd_kernel`, with the LayerNorm recomputed
    per step from the raw x tile (its output y is the MLP input). g_y
    accumulates across H chunks in an f32 VMEM scratch (``acc_ref``); on the
    last chunk the sum is pushed through the LayerNorm backward and written
    to ``dx_ref`` in the INPUT dtype — the dx HBM write is bf16-sized and
    the XLA ``convert`` pass that used to trail every block (f32 dx ->
    bf16, ~5 ms/step over 27 C=512 blocks in the round-2 trace) disappears.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    hc = w1_ref.shape[1]
    num_h = pl.num_programs(1)
    c = x_ref.shape[-1]

    # Rank-agnostic blocks: (tm, c) flat or (1, th, w, c) NHWC (the NHWC
    # path avoids the XLA layout copy of a [B,H,W,C] -> [M,C] reshape).
    yhat, rstd = _ln_rows(x_ref[...].reshape(-1, c).astype(jnp.float32))
    ls = ls_ref[0, :].astype(jnp.float32)
    y = yhat * ls + lb_ref[0, :].astype(jnp.float32)
    y_lp = y.astype(x_ref.dtype)
    gf = g_ref[...].reshape(-1, c).astype(jnp.float32)

    hpre = jnp.dot(y_lp, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[0, :].astype(jnp.float32)
    h, dgelu = _gelu_and_grad(hpre)
    h_lp = h.astype(x_ref.dtype)

    gamma_f = gamma_ref[0, :].astype(jnp.float32)
    g_mlp = (gf * gamma_f).astype(x_ref.dtype)

    g_h = jax.lax.dot_general(
        g_mlp, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g_hpre_f = g_h * dgelu
    g_hpre = g_hpre_f.astype(x_ref.dtype)

    g_y_part = jax.lax.dot_general(
        g_hpre, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1_part = jax.lax.dot_general(
        y_lp, g_hpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_part = jax.lax.dot_general(
        h_lp, gf.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_part = a_part * gamma_f[None, :]
    dgamma_part = jnp.sum(
        w2_ref[:].astype(jnp.float32) * a_part, axis=0, keepdims=True
    )
    db1_part = jnp.sum(g_hpre_f, axis=0, keepdims=True)

    # Accumulate g_y across H chunks in the f32 VMEM scratch.
    @pl.when(j == 0)
    def _():
        acc_ref[:] = g_y_part

    @pl.when(j > 0)
    def _():
        acc_ref[:] += g_y_part

    # Last chunk: finish the LayerNorm backward and emit dx (input dtype).
    @pl.when(j == num_h - 1)
    def _():
        g_y = acc_ref[:]
        dls_part = jnp.sum(g_y * yhat, axis=0, keepdims=True)
        dlb_part = jnp.sum(g_y, axis=0, keepdims=True)
        dyhat = g_y * ls
        dx = rstd * (
            dyhat
            - jnp.mean(dyhat, axis=-1, keepdims=True)
            - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
        )
        dx_ref[...] = dx.reshape(dx_ref.shape).astype(dx_ref.dtype)

        @pl.when(i == 0)
        def _():
            dls_ref[:] = dls_part
            dlb_ref[:] = dlb_part

        @pl.when(i > 0)
        def _():
            dls_ref[:] += dls_part
            dlb_ref[:] += dlb_part

    @pl.when(i == 0)
    def _():
        dw1_ref[:, pl.ds(j * hc, hc)] = dw1_part
        db1_ref[:, pl.ds(j * hc, hc)] = db1_part
        dw2_ref[pl.ds(j * hc, hc), :] = dw2_part

    @pl.when(i > 0)
    def _():
        dw1_ref[:, pl.ds(j * hc, hc)] += dw1_part
        db1_ref[:, pl.ds(j * hc, hc)] += db1_part
        dw2_ref[pl.ds(j * hc, hc), :] += dw2_part

    db2_part = jnp.sum(gf * gamma_f, axis=0, keepdims=True)
    dgamma_b2 = jnp.sum(gf, axis=0, keepdims=True) * b2_ref[0, :].astype(
        jnp.float32
    )
    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        db2_ref[:] = db2_part
        dgamma_ref[:] = dgamma_part + dgamma_b2

    @pl.when(jnp.logical_and(j == 0, i > 0))
    def _():
        db2_ref[:] += db2_part
        dgamma_ref[:] += dgamma_part + dgamma_b2

    @pl.when(j > 0)
    def _():
        dgamma_ref[:] += dgamma_part


def _make_ln_mlp_bwd_kernel_resident(num_h: int):
    """Backward kernel variant with BOTH weight matrices VMEM-RESIDENT and
    the H dimension chunked by an internal fori_loop.

    Why: with the (tile, chunk) grid, the w1/w2 chunk blocks' index map
    changes every step, so Mosaic re-fetches ~full-weight bytes per TOKEN
    TILE — at C=512 that is 128 tiles x 4 MB = 512 MB of weight streaming
    per block backward, roughly half the kernel's critical path (the
    measured 2.2 ms vs a 1.8 ms matmul SOL). Keeping the full (c, hd)/(hd,
    c) bf16 weights as fixed-index input blocks costs 4 MB VMEM once and
    drops the streaming to one fetch per kernel; the hidden chunks slide
    over the resident blocks with pl.ds. Used when the weights fit
    (C == MAX_FUSED_DIM today; smaller widths already have num_h == 1 and
    are naturally resident).
    """

    def kernel(
        x_ref, g_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        gamma_ref,
        dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
        dgamma_ref,
    ):
        i = pl.program_id(0)
        c = x_ref.shape[-1]
        hd = w1_ref.shape[1]
        hc = hd // num_h
        first = i == 0

        yhat, rstd = _ln_rows(x_ref[...].reshape(-1, c).astype(jnp.float32))
        ls = ls_ref[0, :].astype(jnp.float32)
        y = yhat * ls + lb_ref[0, :].astype(jnp.float32)
        y_lp = y.astype(x_ref.dtype)
        gf = g_ref[...].reshape(-1, c).astype(jnp.float32)
        tm = y_lp.shape[0]

        gamma_f = gamma_ref[0, :].astype(jnp.float32)
        g_mlp = (gf * gamma_f).astype(x_ref.dtype)
        g_lp = gf.astype(x_ref.dtype)

        def chunk_body(j, carry):
            g_y_acc, dgamma_acc = carry
            w1c = w1_ref[:, pl.ds(j * hc, hc)]
            b1c = b1_ref[0, pl.ds(j * hc, hc)].astype(jnp.float32)
            w2c = w2_ref[pl.ds(j * hc, hc), :]

            hpre = jnp.dot(y_lp, w1c, preferred_element_type=jnp.float32)
            hpre = hpre + b1c
            h, dgelu = _gelu_and_grad(hpre)
            h_lp = h.astype(x_ref.dtype)

            g_h = jax.lax.dot_general(
                g_mlp, w2c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g_hpre_f = g_h * dgelu
            g_hpre = g_hpre_f.astype(x_ref.dtype)

            g_y_acc = g_y_acc + jax.lax.dot_general(
                g_hpre, w1c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw1_part = jax.lax.dot_general(
                y_lp, g_hpre, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a_part = jax.lax.dot_general(
                h_lp, g_lp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw2_part = a_part * gamma_f[None, :]
            dgamma_acc = dgamma_acc + jnp.sum(
                w2c.astype(jnp.float32) * a_part, axis=0, keepdims=True
            )
            db1_part = jnp.sum(g_hpre_f, axis=0, keepdims=True)

            @pl.when(first)
            def _():
                dw1_ref[:, pl.ds(j * hc, hc)] = dw1_part
                db1_ref[:, pl.ds(j * hc, hc)] = db1_part
                dw2_ref[pl.ds(j * hc, hc), :] = dw2_part

            @pl.when(jnp.logical_not(first))
            def _():
                dw1_ref[:, pl.ds(j * hc, hc)] += dw1_part
                db1_ref[:, pl.ds(j * hc, hc)] += db1_part
                dw2_ref[pl.ds(j * hc, hc), :] += dw2_part

            return g_y_acc, dgamma_acc

        g_y, dgamma_part = jax.lax.fori_loop(
            0,
            num_h,
            chunk_body,
            (
                jnp.zeros((tm, c), jnp.float32),
                jnp.zeros((1, c), jnp.float32),
            ),
        )

        dls_part = jnp.sum(g_y * yhat, axis=0, keepdims=True)
        dlb_part = jnp.sum(g_y, axis=0, keepdims=True)
        dyhat = g_y * ls
        dx = rstd * (
            dyhat
            - jnp.mean(dyhat, axis=-1, keepdims=True)
            - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
        )
        dx_ref[...] = dx.reshape(dx_ref.shape).astype(dx_ref.dtype)

        db2_part = jnp.sum(gf * gamma_f, axis=0, keepdims=True)
        dgamma_b2 = jnp.sum(gf, axis=0, keepdims=True) * b2_ref[0, :].astype(
            jnp.float32
        )

        @pl.when(first)
        def _():
            dls_ref[:] = dls_part
            dlb_ref[:] = dlb_part
            db2_ref[:] = db2_part
            dgamma_ref[:] = dgamma_part + dgamma_b2

        @pl.when(jnp.logical_not(first))
        def _():
            dls_ref[:] += dls_part
            dlb_ref[:] += dlb_part
            db2_ref[:] += db2_part
            dgamma_ref[:] += dgamma_part + dgamma_b2

    return kernel


def _ln_mlp_bwd_pallas_resident(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    g: Array,
    interpret: bool,
) -> tuple[Array, ...]:
    """Resident-weights backward dispatch (see kernel docstring)."""
    c = x.shape[-1]
    h = w1.shape[1]
    hc = _RESIDENT_HCHUNK.get(c, 512)
    if h % hc != 0:
        hc = h
    num_h = h // hc
    m = x.shape[0]

    orig_h = x.shape[1] if x.ndim == 4 else None
    if x.ndim == 4:
        b, hh, ww, _ = x.shape
        th, num_tiles = _nhwc_tiles(x, _BWD_TILE_M.get(c, 256))
        padded_h = num_tiles * th
        if padded_h != hh:
            pad = ((0, 0), (0, padded_h - hh), (0, 0), (0, 0))
            x = jnp.pad(x, pad)
            g = jnp.pad(g, pad)
        tok = pl.BlockSpec(
            (1, th, ww, c),
            lambda i: (i // num_tiles, i % num_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        )
        grid = (b * num_tiles,)
        dx_shape = jax.ShapeDtypeStruct((b, padded_h, ww, c), x.dtype)
    else:
        m = x.shape[0]
        tm = min(_BWD_TILE_M.get(c, 256), m)
        num_tiles = (m + tm - 1) // tm
        padded_m = num_tiles * tm
        if padded_m != m:
            x = jnp.pad(x, ((0, padded_m - m), (0, 0)))
            g = jnp.pad(g, ((0, padded_m - m), (0, 0)))
        tok = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        grid = (num_tiles,)
        dx_shape = jax.ShapeDtypeStruct((padded_m, c), x.dtype)

    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _make_ln_mlp_bwd_kernel_resident(num_h),
        grid=grid,
        in_specs=[
            tok,
            tok,
            fix((1, c)),
            fix((1, c)),
            fix((c, h)),
            fix((1, h)),
            fix((h, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_specs=[
            tok,
            fix((1, c)),
            fix((1, c)),
            fix((c, h)),
            fix((1, h)),
            fix((h, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_shape=[
            dx_shape,
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        g,
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1,
        b1.reshape(1, h),
        w2,
        b2.reshape(1, c),
        gamma.reshape(1, c),
    )
    dx, dls, dlb, dw1, db1, dw2, db2, dgamma = outs
    dx = dx[:, :orig_h] if dx.ndim == 4 else dx[:m]
    return dx, dls, dlb, dw1, db1, dw2, db2, dgamma


# Use the resident-weights backward at widths where the full weight pair
# fits VMEM but needs H chunking (today: exactly MAX_FUSED_DIM). Smaller
# widths have num_h == 1 with naturally-cached weight blocks.
_RESIDENT_BWD_DIMS = {512}
# H chunk for the resident kernel only (hidden-temp sizing knob; the
# weights are whole blocks regardless). hc=1024 measured best in the full
# train step: 200.6 vs 198.7 img/s at hc=512; tm=512 OOMs the compile.
_RESIDENT_HCHUNK = {512: 1024}


def _ln_mlp_bwd_pallas(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    g: Array,
    interpret: bool,
) -> tuple[Array, ...]:
    if x.shape[-1] in _RESIDENT_BWD_DIMS:
        return _ln_mlp_bwd_pallas_resident(
            x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g, interpret
        )
    c = x.shape[-1]
    h = w1.shape[1]
    hc = _BWD_HCHUNK.get(c, 512)
    if h % hc != 0:
        hc = h
    num_h = h // hc

    orig_h = x.shape[1] if x.ndim == 4 else None
    if x.ndim == 4:
        b, hh, ww, _ = x.shape
        th, num_tiles = _nhwc_tiles(x, _BWD_TILE_M.get(c, 256))
        padded_h = num_tiles * th
        if padded_h != hh:
            # Zero-padding g zeroes every padded row's grad contribution.
            pad = ((0, 0), (0, padded_h - hh), (0, 0), (0, 0))
            x = jnp.pad(x, pad)
            g = jnp.pad(g, pad)
        tm = th * ww
        tok = pl.BlockSpec(
            (1, th, ww, c),
            lambda i, j: (i // num_tiles, i % num_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        )
        grid = (b * num_tiles, num_h)
        dx_shape = jax.ShapeDtypeStruct((b, padded_h, ww, c), x.dtype)
    else:
        m = x.shape[0]
        tm = min(_BWD_TILE_M.get(c, 256), m)
        num_tiles = (m + tm - 1) // tm
        padded_m = num_tiles * tm
        if padded_m != m:
            # Zero-padding g zeroes every padded row's grad contribution.
            x = jnp.pad(x, ((0, padded_m - m), (0, 0)))
            g = jnp.pad(g, ((0, padded_m - m), (0, 0)))
        tok = pl.BlockSpec(
            (tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        grid = (num_tiles, num_h)
        dx_shape = jax.ShapeDtypeStruct((padded_m, c), x.dtype)

    fix = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _ln_mlp_bwd_kernel,
        grid=grid,
        in_specs=[
            tok,
            tok,
            fix((1, c)),
            fix((1, c)),
            pl.BlockSpec((c, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            fix((1, c)),
            fix((1, c)),
        ],
        out_specs=[
            tok,
            fix((1, c)),
            fix((1, c)),
            fix((c, h)),
            fix((1, h)),
            fix((h, c)),
            fix((1, c)),
            fix((1, c)),
        ],
        out_shape=[
            dx_shape,
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        interpret=interpret,
    )(
        x,
        g,
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1,
        b1.reshape(1, h),
        w2,
        b2.reshape(1, c),
        gamma.reshape(1, c),
    )
    dx, dls, dlb, dw1, db1, dw2, db2, dgamma = outs
    dx = dx[:, :orig_h] if dx.ndim == 4 else dx[:m]
    return dx, dls, dlb, dw1, db1, dw2, db2, dgamma


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_ln_mlp_ad(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    residual: Array,
    tile_m: int | None,
    interpret: bool,
) -> Array:
    """Differentiable LN+MLP+tail: Pallas forward and backward, primal
    inputs only saved (LN and the 4C hidden both recomputed in VMEM)."""
    return _ln_mlp_pallas(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual, tile_m, interpret
    )


def _fused_ln_mlp_fwd(
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual, tile_m, interpret
):
    out = _ln_mlp_pallas(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual, tile_m, interpret
    )
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual)


def _fused_ln_mlp_bwd(tile_m, interpret, saved, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual = saved
    dx, dls, dlb, dw1, db1, dw2, db2, dgamma = _ln_mlp_bwd_pallas(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g, interpret
    )
    return (
        dx.astype(x.dtype),
        dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
        g.astype(residual.dtype),
    )


_fused_ln_mlp_ad.defvjp(_fused_ln_mlp_fwd, _fused_ln_mlp_bwd)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_ln_mlp(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    residual: Array,
    tile_m: int | None = None,
    interpret: bool = False,
) -> Array:
    """``residual + gamma * mlp(layernorm(x))`` with LN inside the kernel.

    The training-path upgrade over :func:`fused_mlp`: the per-block
    LayerNorm (eps 1e-6, matching nn.LayerNorm) runs inside the Pallas
    kernel in both directions, so XLA's standalone LN forward/backward
    passes (one [M, C] round trip each) disappear from the train step.
    Falls back to the XLA composition above MAX_FUSED_DIM.
    """
    if x.shape[1] > MAX_FUSED_DIM:
        return ln_mlp_reference(
            x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual
        )
    return _fused_ln_mlp_ad(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, residual, tile_m, interpret
    )


def ln_mlp_reference(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array,
    residual: Array,
) -> Array:
    """XLA reference composition of the LN-fused variant."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mu
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    yhat = centered * jax.lax.rsqrt(var + _LN_EPS)
    y = yhat * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return mlp_reference(y.astype(x.dtype), w1, b1, w2, b2, gamma, residual)


def mlp_reference(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Array | None = None,
    residual: Array | None = None,
) -> Array:
    """XLA reference composition (used as fallback and in parity tests)."""
    hidden = jax.nn.gelu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32),
        approximate=True,
    ).astype(x.dtype)
    out = jnp.dot(hidden, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )
    if gamma is not None:
        out = out * gamma.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)
