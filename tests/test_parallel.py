"""Data-parallel correctness: mesh-sharded training equals single-device.

The DP design has no hand-written collectives — XLA inserts the gradient
psum from sharding annotations. This test pins that down: one train step
over the same global batch must produce (numerically) identical params on
a 1-device and an 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spine_vision_tpu.models import CoordinateRegressor, make_coordinate_loss_fn
from spine_vision_tpu.parallel import make_mesh, pad_to_multiple
from spine_vision_tpu.train.state import TrainState
from spine_vision_tpu.train.steps import make_train_step


def _build(seed=0):
    model = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)), train=False
    )
    coord_loss = make_coordinate_loss_fn("smooth_l1")

    def loss_fn(outputs, batch):
        return coord_loss(outputs, batch["coords"], batch["mask"])

    step = make_train_step(
        model.apply, loss_fn, has_batch_stats=bool(variables.get("batch_stats"))
    )
    # Host copies: the train step donates its state, which would otherwise
    # delete the shared device arrays between the two runs.
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    return variables, step


def _batch(rng, n=16):
    return {
        "image": rng.normal(size=(n, 32, 32, 3)).astype(np.float32),
        "coords": rng.uniform(size=(n, 5, 2)).astype(np.float32),
        "mask": np.ones((n, 5), dtype=np.float32),
    }


def _run_step(num_devices, variables, step, host_batch):
    ctx = make_mesh(num_devices=num_devices)
    replicated = NamedSharding(ctx.mesh, P())
    sharded = NamedSharding(ctx.mesh, P("data"))
    state = TrainState.create(
        params=jax.device_put(variables["params"], replicated),
        tx=optax.adamw(1e-3),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated), variables["batch_stats"]
        )
        if variables.get("batch_stats")
        else None,
    )
    device_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharded), host_batch
    )
    new_state, loss = step(state, device_batch)
    return jax.device_get(new_state.params), float(jax.device_get(loss))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_matches_single_device():
    variables, step = _build()
    host_batch = _batch(np.random.default_rng(0))

    params_1, loss_1 = _run_step(1, variables, step, host_batch)
    params_8, loss_8 = _run_step(8, variables, step, host_batch)

    assert np.isclose(loss_1, loss_8, rtol=1e-5), (loss_1, loss_8)
    flat_1 = jax.tree_util.tree_leaves(params_1)
    flat_8 = jax.tree_util.tree_leaves(params_8)
    for a, b in zip(flat_1, flat_8):
        # Cross-device reduction order perturbs tiny gradients, and Adam's
        # rsqrt amplifies them; bound the diff by a fraction of one lr-sized
        # update (lr=1e-3) rather than by relative closeness.
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_make_mesh_raises_on_insufficient_devices():
    """Silently truncating to a smaller mesh hid the round-1 multichip gate
    failure (MULTICHIP_r01.json); make_mesh must refuse instead."""
    with pytest.raises(ValueError, match="num_devices"):
        make_mesh(num_devices=len(jax.devices()) + 1)


def test_pad_to_multiple_semantics():
    batch = {"x": np.arange(10).reshape(5, 2)}
    padded, n = pad_to_multiple(batch, 8)
    assert n == 5
    assert padded["x"].shape == (8, 2)
    np.testing.assert_array_equal(padded["x"][5:], np.tile(batch["x"][-1:], (3, 1)))
    same, n2 = pad_to_multiple(batch, 5)
    assert n2 == 5 and same["x"].shape == (5, 2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("use_pallas", ["mlp", "hybrid"])
def test_dp_step_with_pallas_mlp_matches_single_device(use_pallas):
    """The fused-kernel custom VJPs must compose with mesh sharding: one DP
    step on 8 devices equals the same step on 1 device, flag on. Covers the
    LN-fused MLP and the hybrid whole-block kernel (the TPU training
    default)."""
    model = CoordinateRegressor(
        backbone_name="convnext_tiny", dtype=jnp.float32, use_pallas=use_pallas
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    coord_loss = make_coordinate_loss_fn("smooth_l1")

    def loss_fn(outputs, batch):
        return coord_loss(outputs, batch["coords"], batch["mask"])

    step = make_train_step(model.apply, loss_fn, has_batch_stats=False)
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    host_batch = _batch(np.random.default_rng(1), n=8)

    params_1, loss_1 = _run_step(1, variables, step, host_batch)
    params_8, loss_8 = _run_step(8, variables, step, host_batch)

    assert np.isclose(loss_1, loss_8, rtol=1e-5), (loss_1, loss_8)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_initialize_distributed_noop_single_process(monkeypatch):
    """With no coordinator configured, initialization must be skipped (and
    be idempotent-safe) so single-host entry points can call it blindly."""
    from spine_vision_tpu.parallel import initialize_distributed

    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
