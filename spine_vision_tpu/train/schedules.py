"""Optimizer and learning-rate schedule construction (optax).

Parity with the reference's torch schedulers (trainers/base.py:384-418):
AdamW + {cosine, step, plateau, none}, optional warmup, global-norm gradient
clipping. Cosine anneals per *step* to ``lr * 0.01`` over the whole run, step
decays by gamma every ``scheduler_step_size`` epochs, and plateau is handled
dynamically by the trainer through ``inject_hyperparams`` (the lr lives in
``opt_state.hyperparams`` and is scaled down on stagnating validation loss).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(
    scheduler_type: str,
    learning_rate: float,
    total_steps: int,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    scheduler_step_size: int = 30,
    scheduler_gamma: float = 0.1,
) -> optax.Schedule | float:
    """Build the per-step learning-rate schedule.

    For 'plateau' and 'none' a constant is returned — plateau decay is a
    trainer-side mutation of the injected hyperparameter.
    """
    warmup_steps = warmup_epochs * steps_per_epoch

    if scheduler_type == "cosine":
        cosine = optax.cosine_decay_schedule(
            init_value=learning_rate,
            decay_steps=max(total_steps - warmup_steps, 1),
            alpha=0.01,  # eta_min = lr * 0.01 (reference base.py:403)
        )
        if warmup_steps > 0:
            warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
            return optax.join_schedules([warmup, cosine], [warmup_steps])
        return cosine

    if scheduler_type == "step":
        # torch StepLR steps per epoch; decay every step_size epochs.
        def schedule(count):
            epoch = count // max(steps_per_epoch, 1)
            return learning_rate * scheduler_gamma ** (epoch // scheduler_step_size)

        return schedule

    if scheduler_type in ("plateau", "none"):
        return learning_rate

    raise ValueError(f"Unknown scheduler type: {scheduler_type}")


def build_optimizer(
    learning_rate: Any,
    weight_decay: float = 1e-5,
    grad_clip: float | None = 1.0,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping, lr injected as hyperparam.

    ``inject_hyperparams`` exposes the current lr in
    ``opt_state.hyperparams['learning_rate']`` — read for logging (parity with
    ``optimizer.param_groups[0]['lr']``) and written by the plateau handler.
    """
    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    if grad_clip is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip), adamw)
    return adamw


def current_lr(opt_state: optax.OptState) -> float:
    """Extract the current learning rate from an optimizer state.

    Parity with torch's ``optimizer.param_groups[0]['lr']`` logging: walks the
    optax chain for the InjectHyperparamsState. The hyperparams check comes
    FIRST: InjectHyperparamsState is itself a NamedTuple, so a bare
    isinstance-tuple test would iterate its fields instead of matching it
    (the grad_clip=None case, where no optax.chain wraps it).
    """
    if hasattr(opt_state, "hyperparams"):
        return float(jax.device_get(opt_state.hyperparams["learning_rate"]))
    if isinstance(opt_state, tuple):
        for part in opt_state:
            if hasattr(part, "hyperparams"):
                return float(jax.device_get(part.hyperparams["learning_rate"]))
    raise ValueError("No injected learning_rate found in opt_state")


def set_lr(opt_state: optax.OptState, new_lr: float) -> optax.OptState:
    """Return an opt_state with the injected learning rate replaced.

    Used by the plateau scheduler (trainer-side) to decay lr when the
    validation loss stops improving. Same match order as :func:`current_lr`.
    """

    def replace(part: Any) -> Any:
        if hasattr(part, "hyperparams"):
            hp = dict(part.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                new_lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
            )
            return part._replace(hyperparams=hp)
        return part

    if hasattr(opt_state, "hyperparams"):
        return replace(opt_state)
    if isinstance(opt_state, tuple):
        return tuple(replace(p) for p in opt_state)
    return replace(opt_state)
