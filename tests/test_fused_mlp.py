"""Fused ConvNeXt-MLP Pallas kernel: interpreter-mode parity with XLA."""

import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.fused_mlp import fused_mlp, mlp_reference


@pytest.mark.parametrize("m,c", [(256, 128), (512, 256)])
def test_parity_f32(m, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_non_tile_multiple_tokens():
    rng = np.random.default_rng(1)
    m, c = 300, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    assert got.shape == (m, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_block_tail_gamma_residual():
    rng = np.random.default_rng(3)
    m, c = 256, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    got = fused_mlp(
        x, w1, b1, w2, b2, gamma=gamma, residual=res, tile_m=128, interpret=True
    )
    want = mlp_reference(x, w1, b1, w2, b2, gamma=gamma, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bf16_inputs():
    rng = np.random.default_rng(2)
    m, c = 256, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.125
    )


def test_convnext_flags_match_xla_path():
    """ConvNeXt with Pallas dwconv+MLP flags matches the plain XLA model."""
    import jax

    from spine_vision_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

    cfg = ConvNeXtConfig(depths=(1, 1), dims=(128, 256))
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    ref_model = ConvNeXt(config=cfg)
    variables = ref_model.init(jax.random.key(0), x)
    want = ref_model.apply(variables, x)
    got = ConvNeXt(config=cfg, use_pallas_dwconv=True, use_pallas_mlp=True).apply(
        variables, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
