"""Whole-block TRAINING kernel (ops.block_train): interpreter-mode parity.

Forward reuses the inference megakernel (already covered by
test_convnext_block.py); here the single fused backward kernel — MLP
backward + LayerNorm backward + depthwise weight/bias grads + g_u emission,
with the data grad assembled by one XLA grouped conv — must match the XLA
reference block's gradients for every argument.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.block_train import (
    convnext_block_hybrid,
    convnext_block_train,
)
from tests.test_convnext_block import _block_reference, _make_args


@pytest.mark.parametrize("b,h,w", [(1, 8, 8), (2, 20, 8)])
def test_block_train_forward_parity(b, h, w):
    rng = np.random.default_rng(0)
    args = _make_args(rng, b, h, w, 128)
    got = convnext_block_train(*args, tile_h=8, interpret=True)
    want = _block_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.parametrize(
    "b,h,w,c",
    [
        (1, 8, 8, 128),   # single tile, single H chunk
        (2, 20, 8, 128),  # padded rows (h=20 -> tiles of 8) + batch
        (1, 16, 8, 512),  # multi-H-chunk backward (hc=512, hd=2048)
    ],
)
def test_block_train_gradients_match_reference(b, h, w, c):
    rng = np.random.default_rng(1)
    args = _make_args(rng, b, h, w, c)

    def loss_fused(*a):
        out = convnext_block_train(*a, tile_h=8, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out = _block_reference(*a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = [
        "x", "dw_kernel", "dw_bias", "ln_scale", "ln_bias",
        "w1", "b1", "w2", "b2", "gamma",
    ]
    for name, ga, wa in zip(names, got, want):
        scale = max(1.0, float(jnp.max(jnp.abs(wa))))
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(wa) / scale, atol=5e-3,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("b,h,w", [(1, 8, 8), (2, 20, 8)])
def test_block_hybrid_forward_parity(b, h, w):
    rng = np.random.default_rng(0)
    args = _make_args(rng, b, h, w, 128)
    got = convnext_block_hybrid(*args, tile_h=8, interpret=True)
    want = _block_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.parametrize(
    "b,h,w,c",
    [
        (1, 8, 8, 128),   # single tile, single H chunk
        (2, 20, 8, 128),  # padded rows (h=20 -> tiles of 8) + batch
        (1, 16, 8, 512),  # resident-weights backward path (C=512)
    ],
)
def test_block_hybrid_gradients_match_reference(b, h, w, c):
    rng = np.random.default_rng(1)
    args = _make_args(rng, b, h, w, c)

    def loss_fused(*a):
        out = convnext_block_hybrid(*a, tile_h=8, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out = _block_reference(*a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = [
        "x", "dw_kernel", "dw_bias", "ln_scale", "ln_bias",
        "w1", "b1", "w2", "b2", "gamma",
    ]
    for name, ga, wa in zip(names, got, want):
        scale = max(1.0, float(jnp.max(jnp.abs(wa))))
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(wa) / scale, atol=5e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_block_hybrid_bf16_dtypes():
    rng = np.random.default_rng(2)
    args = _make_args(rng, 1, 8, 8, 128, dtype=jnp.bfloat16)

    def loss(*a):
        out = convnext_block_hybrid(*a, tile_h=8, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(10)))(*args)
    for arg, grad in zip(args, grads):
        assert grad.dtype == arg.dtype
        assert np.all(np.isfinite(np.asarray(grad, np.float32)))


def test_block_train_bf16_dtypes():
    rng = np.random.default_rng(2)
    args = _make_args(rng, 1, 8, 8, 128, dtype=jnp.bfloat16)

    def loss(*a):
        out = convnext_block_train(*a, tile_h=8, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(10)))(*args)
    for arg, grad in zip(args, grads):
        assert grad.dtype == arg.dtype
        assert np.all(np.isfinite(np.asarray(grad, np.float32)))
