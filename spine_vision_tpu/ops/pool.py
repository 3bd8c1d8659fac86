"""Scatter-free max pooling — a measured NEGATIVE result; not the default.

ROUND-5 VERDICT (do not re-enable without new on-chip evidence): this
formulation LOSES 4.6x to ``nn.max_pool``'s select_and_scatter gradient
in ResNet-18@256 b256 training (raw fwd+bwd 1882.5 vs 8652.1 img/s; full
train step 2778.6 vs 6231.3 — BASELINE.md round-5 bisect,
scripts/bisect_resnet_bn_pool.py). Round 4 shipped it as the default
without re-measuring the benched path, causing the BENCH_r04 1884.8
regression. An input-side dilated rewrite (one interior pad of g/y, nine
fused stencil terms over input-sized arrays) measured even worse (928.6
raw). The interior-strided pads / strided slices materialize as relayout
passes on TPU instead of fusing. ``models/resnet.py`` defaults to
``pool_impl="flax"``; this module stays for the A/B toggle and as the
recorded experiment.

Original motivation (round-3 trace): the ReLU/MaxPool fwd+bwd group cost
7.5 ms of a 29.6 ms step, dominated by select_and_scatter over the
[B,128,128,64] stem activation. The reference's envelope is torch's
``max_pool2d`` whose CUDA backward is an argmax-indexed scatter
(reference training/models/backbone.py stem via timm).

The formulation — a max-tree over the window's shifted strided slices:

- forward: ``y = max_{(i,j) in window} x_pad[i::s, j::s]`` — a tree of
  elementwise maxima over strided views;
- backward (custom VJP): for each window offset,
  ``dx_pad[i::s, j::s] += g * (x_slice == y)`` — elementwise compares plus
  strided pads, no scatter (measured: the pads do NOT fuse on TPU).

Tie semantics: ``select_and_scatter`` routes the cotangent to the FIRST
maximal element per window; the eq-mask routes it to EVERY maximal
element.  Exact ties between nonzero bf16 activations are rare, and the
common post-ReLU all-zero window sends its (duplicated) cotangent into
ReLU inputs that are <= 0, where the ReLU backward kills it — training
behavior is indistinguishable (subgradient choice), verified in
tests/test_pool.py against flax on tie-free inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array, lax


def _out_size(size: int, window: int, stride: int, pad: int) -> int:
    return (size + 2 * pad - window) // stride + 1


def _window_slices(
    x_pad: Array, window: tuple[int, int], strides: tuple[int, int],
    out_hw: tuple[int, int],
) -> list[Array]:
    """The window's shifted strided views of the padded input."""
    oh, ow = out_hw
    sh, sw = strides
    slices = []
    for i in range(window[0]):
        for j in range(window[1]):
            slices.append(
                lax.slice(
                    x_pad,
                    (0, i, j, 0),
                    (
                        x_pad.shape[0],
                        i + (oh - 1) * sh + 1,
                        j + (ow - 1) * sw + 1,
                        x_pad.shape[3],
                    ),
                    (1, sh, sw, 1),
                )
            )
    return slices


def _pad_neg_inf(x: Array, padding: tuple[int, int]) -> Array:
    ph, pw = padding
    if ph == 0 and pw == 0:
        return x
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    return jnp.pad(
        x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg
    )


def _forward(
    x: Array, window: tuple[int, int], strides: tuple[int, int],
    padding: tuple[int, int],
) -> Array:
    x_pad = _pad_neg_inf(x, padding)
    oh = _out_size(x.shape[1], window[0], strides[0], padding[0])
    ow = _out_size(x.shape[2], window[1], strides[1], padding[1])
    slices = _window_slices(x_pad, window, strides, (oh, ow))
    y = slices[0]
    for s in slices[1:]:
        y = jnp.maximum(y, s)
    return y


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(
    x: Array,
    window: tuple[int, int] = (3, 3),
    strides: tuple[int, int] = (2, 2),
    padding: tuple[int, int] = (1, 1),
) -> Array:
    """NHWC max pool, gradient-scatter-free (see module docstring)."""
    return _forward(x, window, strides, padding)


def _max_pool_fwd(x, window, strides, padding):
    y = _forward(x, window, strides, padding)
    return y, (x, y)


def _max_pool_bwd(window, strides, padding, res, g):
    x, y = res
    ph, pw = padding
    sh, sw = strides
    x_pad = _pad_neg_inf(x, padding)
    oh, ow = y.shape[1], y.shape[2]
    gf = g.astype(jnp.float32)
    dx_pad = jnp.zeros(x_pad.shape, jnp.float32)
    for i in range(window[0]):
        for j in range(window[1]):
            sl = lax.slice(
                x_pad,
                (0, i, j, 0),
                (
                    x_pad.shape[0],
                    i + (oh - 1) * sh + 1,
                    j + (ow - 1) * sw + 1,
                    x_pad.shape[3],
                ),
                (1, sh, sw, 1),
            )
            contrib = jnp.where(sl == y, gf, 0.0)
            # Transpose of the strided slice: pad with interior zeros back
            # to the padded-input geometry (pure data movement, no scatter).
            dx_pad = dx_pad + lax.pad(
                contrib,
                jnp.asarray(0.0, jnp.float32),
                (
                    (0, 0, 0),
                    (i, x_pad.shape[1] - (i + (oh - 1) * sh + 1), sh - 1),
                    (j, x_pad.shape[2] - (j + (ow - 1) * sw + 1), sw - 1),
                    (0, 0, 0),
                ),
            )
    dx = dx_pad[:, ph: ph + x.shape[1], pw: pw + x.shape[2], :]
    return (dx.astype(x.dtype),)


max_pool.defvjp(_max_pool_fwd, _max_pool_bwd)
