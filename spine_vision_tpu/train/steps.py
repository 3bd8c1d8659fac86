"""Jitted train/eval step factories.

Each factory closes over the model and loss and returns a pure step function
jitted with donated state. Under a data-parallel mesh the batch arrives
sharded on the "data" axis and params replicated; XLA inserts the gradient
psum over ICI automatically from the sharding annotations (the reference's
``accelerator.backward`` DDP all-reduce, trainers/base.py:590, with zero
hand-written communication).

Backbone freezing (reference generic.py:197-203 + epoch-hook unfreezing) is a
static flag: when frozen, gradients *and* final updates for the ``backbone``
param subtree are zeroed, so neither momentum nor weight decay moves frozen
params. The trainer holds one compiled step per freeze state.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from spine_vision_tpu.train.state import TrainState

BACKBONE_KEY = "backbone"


def _mask_backbone(tree: Any, frozen: bool) -> Any:
    """Zero the backbone subtree of a grads/updates pytree when frozen."""
    if not frozen:
        return tree
    unfrozen = dict(tree)
    if BACKBONE_KEY in unfrozen:
        unfrozen[BACKBONE_KEY] = jax.tree_util.tree_map(
            jnp.zeros_like, unfrozen[BACKBONE_KEY]
        )
    return type(tree)(unfrozen) if isinstance(tree, FrozenDict) else unfrozen


def make_train_step(
    apply_fn: Callable[..., Any],
    loss_from_outputs: Callable[[Any, Any], jax.Array],
    has_batch_stats: bool,
    frozen_backbone: bool = False,
    preprocess: Callable[[Any, jax.Array, bool], Any] | None = None,
) -> Callable[[TrainState, Any], tuple[TrainState, jax.Array]]:
    """Build a jitted train step.

    Args:
        apply_fn: ``model.apply``.
        loss_from_outputs: ``(outputs, batch) -> scalar loss``.
        has_batch_stats: Whether the model mutates BatchNorm stats.
        frozen_backbone: Statically freeze the backbone param subtree.
        preprocess: Optional traced ``(batch, key, train) -> batch`` run on
            device before the forward pass (normalization + augmentation —
            uint8 batches cross the host/device boundary, everything else
            fuses into the step).

    Returns:
        ``step(state, batch) -> (new_state, loss)`` with donated state.
    """

    def loss_fn(params, batch_stats, dropout_key, batch):
        if preprocess is not None:
            aug_key = jax.random.fold_in(dropout_key, 1)
            batch = preprocess(batch, aug_key, True)
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            outputs, updates = apply_fn(
                variables,
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            new_stats = updates["batch_stats"]
        else:
            outputs = apply_fn(
                variables, batch["image"], train=True, rngs={"dropout": dropout_key}
            )
            new_stats = batch_stats
        loss = loss_from_outputs(outputs, batch)
        return loss, new_stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Any) -> tuple[TrainState, jax.Array]:
        dropout_key, next_key = jax.random.split(state.dropout_key)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, dropout_key, batch
        )
        grads = _mask_backbone(grads, frozen_backbone)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        updates = _mask_backbone(updates, frozen_backbone)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                batch_stats=new_stats,
                dropout_key=next_key,
            ),
            loss,
        )

    return train_step


def make_eval_step(
    apply_fn: Callable[..., Any],
    loss_from_outputs: Callable[[Any, Any], jax.Array],
    has_batch_stats: bool,
    preprocess: Callable[[Any, jax.Array, bool], Any] | None = None,
) -> Callable[[TrainState, Any], tuple[Any, jax.Array]]:
    """Build a jitted eval step: ``(state, batch) -> (outputs, loss)``."""

    @jax.jit
    def eval_step(state: TrainState, batch: Any) -> tuple[Any, jax.Array]:
        if preprocess is not None:
            batch = preprocess(batch, state.dropout_key, False)
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = apply_fn(variables, batch["image"], train=False)
        loss = loss_from_outputs(outputs, batch)
        return outputs, loss

    return eval_step


def make_predict_fn(
    apply_fn: Callable[..., Any],
    has_batch_stats: bool,
    preprocess_images: Callable[[jax.Array], jax.Array] | None = None,
) -> Callable[[TrainState, jax.Array], Any]:
    """Build a jitted inference-only forward: ``(state, images) -> outputs``."""

    @jax.jit
    def predict(state: TrainState, images: jax.Array) -> Any:
        if preprocess_images is not None:
            images = preprocess_images(images)
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        return apply_fn(variables, images, train=False)

    return predict
