"""Fused whole-ConvNeXt-block Pallas kernel: interpreter-mode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.convnext_block import convnext_block_fused
from spine_vision_tpu.ops.dwconv import depthwise_conv7x7_reference
from spine_vision_tpu.ops.fused_mlp import mlp_reference


def _block_reference(x, k, bias, scale, beta, w1, b1, w2, b2, gamma, eps=1e-6):
    y = depthwise_conv7x7_reference(x, k) + bias.astype(x.dtype)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.var(yf, axis=-1, keepdims=True)
    yn = ((yf - mu) * jax.lax.rsqrt(var + eps) * scale + beta).astype(x.dtype)
    b_, h_, w_, c = x.shape
    out = mlp_reference(
        yn.reshape(-1, c), w1, b1, w2, b2, gamma=gamma,
        residual=x.reshape(-1, c),
    )
    return out.reshape(b_, h_, w_, c)


def _make_args(rng, b, h, w, c, dtype=jnp.float32):
    return (
        jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, dtype),
        jnp.asarray(rng.normal(size=(7, 7, c)) * 0.1, dtype),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, dtype),
        jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, dtype),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32),
    )


@pytest.mark.parametrize("b,h,w", [(1, 8, 8), (2, 20, 8)])
def test_block_parity(b, h, w):
    rng = np.random.default_rng(0)
    args = _make_args(rng, b, h, w, 128)
    got = convnext_block_fused(*args, tile_h=8, interpret=True)
    want = _block_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3,
    )


def test_block_gradients_match_reference():
    rng = np.random.default_rng(1)
    args = _make_args(rng, 1, 8, 8, 128)

    def loss_fused(*a):
        out = convnext_block_fused(*a, tile_h=8, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out = _block_reference(*a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for i, (ga, wa) in enumerate(zip(got, want)):
        scale = max(1.0, float(jnp.max(jnp.abs(wa))))
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(wa) / scale, atol=5e-3,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_block_bf16():
    rng = np.random.default_rng(2)
    args = _make_args(rng, 1, 8, 8, 128, dtype=jnp.bfloat16)
    got = convnext_block_fused(*args, tile_h=8, interpret=True)
    want = _block_reference(*args)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.25
    )


def test_convnext_model_grads_with_megakernel():
    """ConvNeXt with both Pallas flags (whole-block megakernel) produces
    grads matching the plain XLA model."""
    from spine_vision_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

    cfg = ConvNeXtConfig(depths=(1, 1), dims=(128, 256))
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    ref_model = ConvNeXt(config=cfg)
    variables = ref_model.init(jax.random.key(0), x)
    pallas_model = ConvNeXt(config=cfg, use_pallas_dwconv=True, use_pallas_mlp=True)

    def loss(model, params):
        out = model.apply({"params": params}, x)
        return jnp.sum(out * out)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(variables["params"])
    g_pal = jax.grad(lambda p: loss(pallas_model, p))(variables["params"])
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_pal = dict(jax.tree.leaves_with_path(g_pal))
    assert len(flat_ref) == len(flat_pal)
    for path, leaf in flat_ref:
        scale = max(1.0, float(jnp.max(jnp.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(flat_pal[path]) / scale, np.asarray(leaf) / scale,
            atol=2e-3, err_msg=f"grad mismatch at {path}",
        )
