"""Schedules: lr injection must survive every optimizer shape."""

import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.train.schedules import (
    build_lr_schedule,
    build_optimizer,
    current_lr,
    set_lr,
)


@pytest.mark.parametrize("grad_clip", [1.0, None])
def test_current_and_set_lr(grad_clip):
    """grad_clip=None leaves a bare InjectHyperparamsState (a NamedTuple) —
    regression: tuple-iterating it used to raise / silently corrupt."""
    tx = build_optimizer(1e-3, weight_decay=1e-5, grad_clip=grad_clip)
    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    assert current_lr(opt_state) == pytest.approx(1e-3)

    new_state = set_lr(opt_state, 5e-4)
    assert current_lr(new_state) == pytest.approx(5e-4)
    # The modified state must still drive updates.
    grads = {"w": jnp.ones((3,))}
    updates, _ = tx.update(grads, new_state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_step_schedule_decays_per_epoch():
    schedule = build_lr_schedule(
        "step", 1e-2, total_steps=100, steps_per_epoch=10,
        scheduler_step_size=2, scheduler_gamma=0.1,
    )
    assert schedule(0) == pytest.approx(1e-2)
    assert schedule(19) == pytest.approx(1e-2)  # epoch 1
    assert schedule(20) == pytest.approx(1e-3)  # epoch 2
    assert schedule(40) == pytest.approx(1e-4)


def test_cosine_with_warmup():
    schedule = build_lr_schedule(
        "cosine", 1e-2, total_steps=100, steps_per_epoch=10, warmup_epochs=2
    )
    assert float(schedule(0)) == pytest.approx(0.0)
    assert float(schedule(20)) == pytest.approx(1e-2, rel=1e-3)
    assert float(schedule(99)) < 1e-2
