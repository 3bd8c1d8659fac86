"""Minimal-HBM-traffic BatchNorm for TPU training.

Why not ``flax.linen.BatchNorm``: with bf16 activations flax upcasts the
full activation tensor to float32, computes mean/var AND the normalize
elementwise in f32, and autodiff saves f32 residuals — on the round-3
ResNet-18@256 b256 trace those materialized converts + f32 passes cost
~6.3 ms of a 29.6 ms step (BASELINE.md row).  The reference's envelope is
torch BN inside AMP (reference training/trainers/classification.py:112,134),
which runs the elementwise in half precision with f32 statistics — this
module is the XLA-native equivalent, written so every full-size pass reads
and writes bf16:

- forward: one fused reduction pass over x (bf16 reads, f32 accumulation
  of sum and sum-of-squares), then ONE fused elementwise pass
  ``y = x*A + B`` with per-channel f32 scalars folded from
  (mean, var, scale, bias);
- backward (custom VJP): one fused reduction pass over (g, x) producing
  (sum g, sum g*x) in f32, then ONE fused elementwise pass
  ``dx = A*g + P*x + Q`` emitting bf16 directly.  Residuals are the bf16
  x plus [C]-sized f32 scalars — autodiff's f32 activation residual never
  exists.

Statistics math matches flax/torch BN: biased variance (divide by N),
running stats updated as ``momentum*old + (1-momentum)*batch`` with the
batch variance (biased, matching flax; torch uses unbiased for the
running update — the reference consumes timm checkpoints through our
converter which keeps stats verbatim, so the tiny momentum-path deviation
from torch only affects fresh training, like flax itself).

Under a data-parallel ``jit`` the reductions are global automatically
(XLA inserts the psum from the batch sharding).  ``axis_name`` supports
``shard_map``/``pmap`` contexts: forward and backward reductions are
psum'd across the named axis, so gradients match the replicated math.

Parity: ``TpuBatchNorm`` registers the same variables as
``flax.linen.BatchNorm`` (params ``scale``/``bias``, batch_stats
``mean``/``var``) so existing checkpoints and ``models/convert.py``
mappings load unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array, lax


def _reduce_axes(x: Array) -> tuple[int, ...]:
    """All axes except the trailing feature axis."""
    return tuple(range(x.ndim - 1))


def _batch_moments(
    x: Array, axis_name: str | None
) -> tuple[Array, Array, Array]:
    """Per-channel (mean, var, count) with f32 accumulation over bf16 reads.

    The f32 upcast feeds ONLY the reductions, so XLA fuses it into the
    reduce pass — no f32 copy of x is ever materialized.
    """
    axes = _reduce_axes(x)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=axes)
    s2 = jnp.sum(jnp.square(xf), axis=axes)
    n = jnp.asarray(x.size // x.shape[-1], jnp.float32)
    if axis_name is not None:
        s1 = lax.psum(s1, axis_name)
        s2 = lax.psum(s2, axis_name)
        n = lax.psum(n, axis_name)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, var, n


def _fold_scale_shift(
    mean: Array, var: Array, scale: Array, bias: Array, eps: float
) -> tuple[Array, Array]:
    """Fold (mean, var, scale, bias) into per-channel ``y = x*A + B``."""
    inv = lax.rsqrt(var + eps)
    a = scale * inv
    return a, bias - mean * a


def _apply_scale_shift(x: Array, a: Array, b: Array) -> Array:
    """One fused elementwise pass; bf16 in -> bf16 out, f32 scalar math."""
    return (x.astype(jnp.float32) * a + b).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _bn_train(
    x: Array, scale: Array, bias: Array, mean: Array, var: Array, eps: float,
    axis_name: str | None,
) -> Array:
    a, b = _fold_scale_shift(mean, var, scale, bias, eps)
    return _apply_scale_shift(x, a, b)


def _bn_train_fwd(x, scale, bias, mean, var, eps, axis_name):
    a, b = _fold_scale_shift(mean, var, scale, bias, eps)
    y = _apply_scale_shift(x, a, b)
    inv = lax.rsqrt(var + eps)
    n = jnp.asarray(x.size // x.shape[-1], jnp.float32)
    return y, (x, scale, mean, inv, n)


def _bn_train_bwd(eps, axis_name, res, g):
    x, scale, mean, inv, n = res
    axes = _reduce_axes(x)
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    # One fused reduction pass over (g, x): both sums read the same tiles.
    sg = jnp.sum(gf, axis=axes)
    sgx = jnp.sum(gf * xf, axis=axes)
    if axis_name is not None:
        sg = lax.psum(sg, axis_name)
        sgx = lax.psum(sgx, axis_name)
        n = lax.psum(n, axis_name)
    dgamma = inv * (sgx - mean * sg)  # = sum(g * xhat)
    dbeta = sg
    a = scale * inv
    # dx = a*(g - sg/n - xhat*dgamma/n) rewritten as A*g + P*x + Q so the
    # elementwise pass reads only (g, x) and per-channel scalars.
    p = -(a * inv) * dgamma / n
    q = (a * inv * mean * dgamma - a * sg) / n
    dx = (gf * a + xf * p + q).astype(x.dtype)
    # mean/var get zero cotangents: their contribution to dx (gradient
    # through the batch statistics) is already folded into the three-term
    # formula above, so the differentiable _batch_moments chain outside
    # this VJP must receive nothing.
    zeros_c = jnp.zeros_like(mean)
    return dx, dgamma, dbeta, zeros_c, zeros_c


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def batch_norm_train(
    x: Array,
    scale: Array,
    bias: Array,
    eps: float = 1e-5,
    axis_name: str | None = None,
) -> tuple[Array, Array, Array]:
    """Training-mode BN: normalize by batch statistics.

    Returns ``(y, batch_mean, batch_var)`` — the caller owns the running-
    stat update.  Gradients flow through the batch statistics exactly as
    in flax/torch BN (the custom VJP carries the full three-term formula).
    """
    mean, var, _ = _batch_moments(x, axis_name)
    y = _bn_train(x, scale, bias, mean, var, eps, axis_name)
    return y, mean, var


def batch_norm_inference(
    x: Array, scale: Array, bias: Array, mean: Array, var: Array,
    eps: float = 1e-5,
) -> Array:
    """Inference-mode BN: one fused scale-shift pass from running stats."""
    a, b = _fold_scale_shift(mean, var, scale, bias, eps)
    return _apply_scale_shift(x, a, b)


class TpuBatchNorm(nn.Module):
    """Drop-in ``flax.linen.BatchNorm`` replacement (scale+bias variant).

    Same variable layout (params ``scale``/``bias``; batch_stats
    ``mean``/``var``), same statistics math, but every full-size pass is a
    single fused bf16 read/write (see module docstring).  Only the
    configuration surface this package uses is implemented: affine BN over
    the trailing feature axis.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None  # kept for interface parity; output follows x.dtype
    axis_name: str | None = None
    scale_init: Any = nn.initializers.ones_init()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(
        self, x: Array, use_running_average: bool | None = None
    ) -> Array:
        use_running = nn.merge_param(
            "use_running_average",
            self.use_running_average,
            use_running_average,
        )
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,), jnp.float32)
        bias = self.param("bias", self.bias_init, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (features,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (features,),
        )

        if use_running:
            return batch_norm_inference(
                x, scale, bias, ra_mean.value, ra_var.value, self.epsilon
            )

        y, mean, var = batch_norm_train(
            x, scale, bias, self.epsilon, self.axis_name
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y
