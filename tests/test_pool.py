"""ops.pool.max_pool parity vs flax.linen.max_pool (fwd + grad)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.pool import max_pool

CASES = [
    # (H, W, C, window, strides, padding)
    (128, 128, 8, (3, 3), (2, 2), (1, 1)),  # the ResNet stem pool
    (17, 23, 4, (3, 3), (2, 2), (1, 1)),  # odd sizes
    (16, 16, 4, (2, 2), (2, 2), (0, 0)),  # non-overlapping
    (9, 9, 2, (3, 3), (1, 1), (1, 1)),  # stride 1
]


def _ref_pool(x, window, strides, padding):
    return nn.max_pool(
        x, window, strides=strides,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
    )


@pytest.mark.parametrize("h,w,c,window,strides,padding", CASES)
def test_forward_matches_flax(h, w, c, window, strides, padding):
    rng = np.random.default_rng(h * w)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    np.testing.assert_array_equal(
        max_pool(x, window, strides, padding),
        _ref_pool(x, window, strides, padding),
    )


@pytest.mark.parametrize("h,w,c,window,strides,padding", CASES)
def test_gradient_matches_flax(h, w, c, window, strides, padding):
    # f32 random normals make exact in-window ties measure-zero, so the
    # eq-mask backward and select_and_scatter agree exactly.
    rng = np.random.default_rng(h + w)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    g_tgt = jnp.asarray(
        rng.normal(size=_ref_pool(x, window, strides, padding).shape),
        jnp.float32,
    )
    g_ours = jax.grad(
        lambda q: jnp.sum(max_pool(q, window, strides, padding) * g_tgt)
    )(x)
    g_ref = jax.grad(
        lambda q: jnp.sum(_ref_pool(q, window, strides, padding) * g_tgt)
    )(x)
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-6, rtol=1e-6)


def test_bf16_forward_and_grad_dtype():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 16)), jnp.bfloat16)
    y = max_pool(x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        y.astype(jnp.float32),
        _ref_pool(x, (3, 3), (2, 2), (1, 1)).astype(jnp.float32),
    )
    dx = jax.grad(lambda q: jnp.sum(max_pool(q).astype(jnp.float32)))(x)
    assert dx.dtype == jnp.bfloat16


def test_tied_window_gradient_is_subgradient():
    """All-equal window: eq-mask sends g to every tied element (a valid
    subgradient); document the deviation from select_and_scatter's
    first-element routing rather than silently relying on it."""
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    dx = jax.grad(lambda q: jnp.sum(max_pool(q, (2, 2), (2, 2), (0, 0))))(x)
    # every element ties in exactly one window -> gradient 1 everywhere
    np.testing.assert_array_equal(dx, jnp.ones_like(x))
