"""TpuBatchNorm parity vs flax.linen.BatchNorm (fwd, grads, running stats)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.batchnorm import (
    TpuBatchNorm,
    batch_norm_inference,
    batch_norm_train,
)


def _flax_bn(train: bool):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32,
    )


@pytest.fixture()
def x32():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(1.5, 2.0, size=(8, 6, 6, 16)), jnp.float32)


def test_train_forward_matches_flax(x32):
    ours = TpuBatchNorm(use_running_average=False)
    ref = _flax_bn(train=True)
    v_ours = ours.init(jax.random.PRNGKey(0), x32)
    v_ref = ref.init(jax.random.PRNGKey(0), x32)
    y_ours, m_ours = ours.apply(v_ours, x32, mutable=["batch_stats"])
    y_ref, m_ref = ref.apply(v_ref, x32, mutable=["batch_stats"])
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        m_ours["batch_stats"]["mean"], m_ref["batch_stats"]["mean"],
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        m_ours["batch_stats"]["var"], m_ref["batch_stats"]["var"],
        atol=1e-5, rtol=1e-4,
    )


def test_inference_matches_flax(x32):
    scale = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2, 16), jnp.float32)
    bias = jnp.asarray(np.random.default_rng(2).normal(size=16), jnp.float32)
    mean = jnp.asarray(np.random.default_rng(3).normal(size=16), jnp.float32)
    var = jnp.asarray(np.random.default_rng(4).uniform(0.5, 3, 16), jnp.float32)
    variables = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": {"mean": mean, "var": var},
    }
    y_ours = TpuBatchNorm(use_running_average=True).apply(variables, x32)
    y_ref = _flax_bn(train=False).apply(variables, x32)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-5, rtol=1e-5)


def test_train_gradients_match_flax(x32):
    """Full three-term BN backward (through the batch statistics)."""
    scale = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2, 16), jnp.float32)
    bias = jnp.asarray(np.random.default_rng(2).normal(size=16), jnp.float32)
    variables = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": {"mean": jnp.zeros(16), "var": jnp.ones(16)},
    }
    tgt = jnp.asarray(
        np.random.default_rng(5).normal(size=x32.shape), jnp.float32
    )

    def loss_ours(params, x):
        y, _ = TpuBatchNorm(use_running_average=False).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return jnp.sum((y - tgt) ** 2)

    def loss_ref(params, x):
        y, _ = _flax_bn(train=True).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return jnp.sum((y - tgt) ** 2)

    (gp_ours, gx_ours) = jax.grad(loss_ours, argnums=(0, 1))(
        variables["params"], x32
    )
    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(
        variables["params"], x32
    )
    np.testing.assert_allclose(gx_ours, gx_ref, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(
        gp_ours["scale"], gp_ref["scale"], atol=1e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        gp_ours["bias"], gp_ref["bias"], atol=1e-3, rtol=1e-4
    )


def test_bf16_pass_stays_bf16_and_close(x32):
    xb = x32.astype(jnp.bfloat16)
    scale = jnp.ones(16, jnp.float32) * 1.3
    bias = jnp.full((16,), 0.25, jnp.float32)
    y, mean, var = batch_norm_train(xb, scale, bias)
    assert y.dtype == jnp.bfloat16
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32
    y32, m32, v32 = batch_norm_train(x32, scale, bias)
    np.testing.assert_allclose(
        y.astype(jnp.float32), y32, atol=0.05, rtol=0.05
    )
    np.testing.assert_allclose(mean, m32, atol=0.02, rtol=0.02)
    np.testing.assert_allclose(var, v32, atol=0.05, rtol=0.05)


def test_inference_fn_direct(x32):
    scale = jnp.ones(16) * 2.0
    bias = jnp.zeros(16)
    mean = jnp.full((16,), 1.5)
    var = jnp.full((16,), 4.0)
    y = batch_norm_inference(x32, scale, bias, mean, var, eps=0.0)
    np.testing.assert_allclose(y, (x32 - 1.5), atol=1e-5, rtol=1e-5)


def test_data_parallel_global_stats(x32):
    """Under a DP-sharded jit the batch statistics must be global: sharded
    output equals the single-device output bit-for-bit-ish."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    ours = TpuBatchNorm(use_running_average=False)
    variables = ours.init(jax.random.PRNGKey(0), x32)

    @jax.jit
    def fwd(v, x):
        return ours.apply(v, x, mutable=["batch_stats"])

    y_single, stats_single = fwd(variables, x32)
    xs = jax.device_put(x32, NamedSharding(mesh, P("data")))
    y_shard, stats_shard = fwd(variables, xs)
    np.testing.assert_allclose(
        np.asarray(y_shard), np.asarray(y_single), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_shard["batch_stats"]["mean"]),
        np.asarray(stats_single["batch_stats"]["mean"]),
        atol=1e-6, rtol=1e-6,
    )
