"""Pallas depthwise conv: interpreter-mode parity with lax grouped conv."""

import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.dwconv import (
    depthwise_conv7x7,
    depthwise_conv7x7_reference,
)


@pytest.mark.parametrize("shape,tile_h", [((2, 16, 12, 128), 8), ((1, 8, 8, 128), 8)])
def test_pallas_matches_lax(shape, tile_h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, shape[-1])), jnp.float32)
    got = depthwise_conv7x7(x, k, tile_h=tile_h, interpret=True)
    want = depthwise_conv7x7_reference(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_non_tile_multiple_height():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 11, 12, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 128)), jnp.float32)
    got = depthwise_conv7x7(x, k, tile_h=8, interpret=True)
    want = depthwise_conv7x7_reference(x, k)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_dwconv_ln_matches_composition():
    import jax

    from spine_vision_tpu.ops.dwconv import depthwise_conv7x7_ln

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    got = depthwise_conv7x7_ln(x, k, b, scale, beta, tile_h=8, interpret=True)
    y = depthwise_conv7x7_reference(x, k) + b
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.var(y, -1, keepdims=True)
    want = (y - mu) * jax.lax.rsqrt(var + 1e-6) * scale + beta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_dwconv_ln_gradients_match_reference():
    """custom-VJP: grads of the fused dwconv+LN match jax.grad of XLA."""
    import jax

    from spine_vision_tpu.ops.dwconv import depthwise_conv7x7_ln

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def loss_fused(x, k, b, scale, beta):
        out = depthwise_conv7x7_ln(x, k, b, scale, beta, tile_h=8, interpret=True)
        return jnp.sum(out * out)

    def loss_ref(x, k, b, scale, beta):
        y = depthwise_conv7x7_reference(x, k) + b
        mu = jnp.mean(y, -1, keepdims=True)
        var = jnp.var(y, -1, keepdims=True)
        out = (y - mu) * jax.lax.rsqrt(var + 1e-6) * scale + beta
        return jnp.sum(out * out)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, beta)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, beta)
    for i, (ga, wa) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(wa), atol=5e-3, rtol=1e-4,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_fused_dwconv_ln_gradients_multi_tile_batch():
    """Backward accumulates d_kernel/d_bias/d_scale/d_beta across (batch,
    h-tile) grid steps; H not a tile multiple exercises zero-padded rows."""
    import jax

    from spine_vision_tpu.ops.dwconv import depthwise_conv7x7_ln

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 20, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def loss_fused(x, k, b, scale, beta):
        out = depthwise_conv7x7_ln(x, k, b, scale, beta, tile_h=8, interpret=True)
        return jnp.sum(out * out)

    def loss_ref(x, k, b, scale, beta):
        y = depthwise_conv7x7_reference(x, k) + b
        mu = jnp.mean(y, -1, keepdims=True)
        var = jnp.var(y, -1, keepdims=True)
        out = (y - mu) * jax.lax.rsqrt(var + 1e-6) * scale + beta
        return jnp.sum(out * out)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, beta)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, b, scale, beta)
    for i, (ga, wa) in enumerate(zip(got, want)):
        scale_i = max(1.0, float(jnp.max(jnp.abs(wa))))
        np.testing.assert_allclose(
            np.asarray(ga) / scale_i, np.asarray(wa) / scale_i, atol=5e-4,
            err_msg=f"grad mismatch for arg {i}",
        )
