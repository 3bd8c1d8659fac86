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
# C=512 at tile_m=2048 exceeds the 16 MB scoped-vmem limit.
_BEST_TILE_M = {128: 1024, 256: 2048, 512: 1024}


def _erf_gelu(x: Array) -> Array:
    """erf-based GELU via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7).

    Mosaic lowers neither erf nor erfc, so the exact-GELU erf is computed
    from exp (supported) with the classic rational approximation; 1.5e-7
    absolute error is at f32 rounding for the activation magnitudes here.
    """
    z = x * (1.0 / math.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _mlp_core(x_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0, :].astype(jnp.float32)
    h = _erf_gelu(h).astype(x.dtype)
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
    """Differentiable fused MLP tail: forward = Pallas, backward = XLA
    recompute (checkpoint-style: only the primal inputs are saved; the 4C
    hidden is recomputed in the backward pass, trading two cheap MXU
    matmuls for not storing/reloading the hidden through HBM)."""
    return _pallas_mlp(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret):
    out = _pallas_mlp(x, w1, b1, w2, b2, gamma, residual, tile_m, interpret)
    return out, (x, w1, b1, w2, b2, gamma, residual)


def _fused_mlp_bwd(tile_m, interpret, saved, g):
    x, w1, b1, w2, b2, gamma, residual = saved
    _, vjp = jax.vjp(mlp_reference, x, w1, b1, w2, b2, gamma, residual)
    return vjp(g)


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
    """Differentiable no-tail fused MLP (same fwd-Pallas / bwd-XLA-recompute
    contract as the tail variant, without streaming a zeros residual)."""
    return _pallas_mlp(x, w1, b1, w2, b2, None, None, tile_m, interpret)


def _fused_mlp_plain_fwd(x, w1, b1, w2, b2, tile_m, interpret):
    out = _pallas_mlp(x, w1, b1, w2, b2, None, None, tile_m, interpret)
    return out, (x, w1, b1, w2, b2)


def _fused_mlp_plain_bwd(tile_m, interpret, saved, g):
    x, w1, b1, w2, b2 = saved
    _, vjp = jax.vjp(mlp_reference, x, w1, b1, w2, b2)
    return vjp(g)


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
        approximate=False,
    ).astype(x.dtype)
    out = jnp.dot(hidden, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )
    if gamma is not None:
        out = out * gamma.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)
