"""Pure jittable loss functions.

All losses are pure ``jnp`` functions usable inside ``jax.jit``/``pjit`` traced
training steps. They cover the loss surface of the reference:

- binary cross entropy with logits  (reference core/tasks.py:153 BCEWithLogitsLoss)
- focal loss for binary logits      (reference training/losses.py:25-139)
- softmax cross entropy w/ label smoothing (reference core/tasks.py:193)
- mse / smooth-l1 / huber coordinate losses, optionally masked
  (reference training/models/generic.py:354-417)

Losses compute in float32 regardless of input dtype (bf16-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def binary_cross_entropy_with_logits(
    logits: Array,
    targets: Array,
    pos_weight: float | None = None,
) -> Array:
    """Elementwise numerically-stable BCE with logits.

    Matches torch.nn.functional.binary_cross_entropy_with_logits semantics:
    ``max(x,0) - x*t + log(1 + exp(-|x|))``, with optional positive-class
    weight multiplying the ``t*log(sigmoid(x))`` term.

    Args:
        logits: Raw scores, any shape.
        targets: Same shape as logits, values in [0, 1].
        pos_weight: Optional weight for the positive term.

    Returns:
        Elementwise loss, same shape as inputs, float32.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is None:
        return -(targets * log_p + (1.0 - targets) * log_not_p)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_loss_with_logits(
    logits: Array,
    targets: Array,
    gamma: float = 2.0,
    alpha: float | None = None,
    pos_weight: float | None = None,
    reduction: str = "mean",
) -> Array:
    """Binary focal loss: ``(1 - p_t)^gamma * BCE``.

    Mirrors the reference FocalLoss (training/losses.py:90-139): the focal
    modulation uses plain sigmoid probabilities while the CE term uses the
    stable formulation; ``alpha`` weights positive/negative examples as
    ``alpha * t + (1 - alpha) * (1 - t)``.

    Args:
        logits: Raw scores.
        targets: Binary targets, same shape.
        gamma: Focusing parameter.
        alpha: Optional positive-class balance weight.
        pos_weight: Optional pos_weight for the BCE term.
        reduction: 'none' | 'mean' | 'sum'.

    Returns:
        Loss per the chosen reduction (float32).
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    p_t = probs * targets + (1.0 - probs) * (1.0 - targets)
    focal_weight = (1.0 - p_t) ** gamma
    bce = binary_cross_entropy_with_logits(logits, targets, pos_weight=pos_weight)
    loss = focal_weight * bce
    if alpha is not None:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def softmax_cross_entropy(
    logits: Array,
    labels: Array,
    label_smoothing: float = 0.0,
) -> Array:
    """Per-example softmax cross entropy with integer labels.

    Matches torch.nn.CrossEntropyLoss(label_smoothing=s) semantics: the target
    distribution is ``(1 - s) * onehot + s / num_classes``.

    Args:
        logits: [..., num_classes] raw scores.
        labels: [...] integer class labels.
        label_smoothing: Smoothing factor in [0, 1).

    Returns:
        Per-example loss, shape ``labels.shape``, float32.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = (1.0 - label_smoothing) * onehot + label_smoothing / num_classes
    return -jnp.sum(onehot * log_probs, axis=-1)


def mse_loss(predictions: Array, targets: Array) -> Array:
    """Elementwise squared error (float32)."""
    diff = predictions.astype(jnp.float32) - targets.astype(jnp.float32)
    return diff * diff


def smooth_l1_loss(predictions: Array, targets: Array, beta: float = 1.0) -> Array:
    """Elementwise smooth-L1 (torch.nn.SmoothL1Loss, beta=1.0 default).

    ``0.5 * d^2 / beta`` for ``|d| < beta`` else ``|d| - 0.5 * beta``.
    """
    diff = jnp.abs(predictions.astype(jnp.float32) - targets.astype(jnp.float32))
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def huber_loss(predictions: Array, targets: Array, delta: float = 0.1) -> Array:
    """Elementwise Huber loss (torch.nn.HuberLoss, reference uses delta=0.1).

    ``0.5 * d^2`` for ``|d| <= delta`` else ``delta * (|d| - 0.5 * delta)``.
    """
    diff = jnp.abs(predictions.astype(jnp.float32) - targets.astype(jnp.float32))
    return jnp.where(
        diff <= delta, 0.5 * diff * diff, delta * (diff - 0.5 * delta)
    )


_COORD_LOSSES = {
    "mse": mse_loss,
    "smooth_l1": smooth_l1_loss,
    "huber": huber_loss,
}


def masked_coordinate_loss(
    predictions: Array,
    targets: Array,
    mask: Array | None = None,
    loss_type: str = "smooth_l1",
) -> Array:
    """Mean coordinate regression loss over valid (masked) entries.

    jit-compatible reformulation of the reference's boolean-indexing masked
    loss (training/models/generic.py:393-417): instead of gathering valid
    elements (dynamic shape), multiply the elementwise loss by the expanded
    mask and normalize by the number of valid elements.

    Args:
        predictions: [B, L, 2] predicted coordinates.
        targets: [B, L, 2] target coordinates.
        mask: Optional [B, L] validity mask (1=valid). If None, all valid.
        loss_type: 'mse' | 'smooth_l1' | 'huber'.

    Returns:
        Scalar mean loss over valid coordinate elements (0.0 if none valid).
    """
    if loss_type not in _COORD_LOSSES:
        raise ValueError(f"Unknown loss type: {loss_type}")
    if loss_type == "huber":
        elementwise = huber_loss(predictions, targets, delta=0.1)
    else:
        elementwise = _COORD_LOSSES[loss_type](predictions, targets)
    if mask is None:
        return jnp.mean(elementwise)
    mask_f = mask.astype(jnp.float32)[..., None]
    num_valid = jnp.sum(mask_f) * elementwise.shape[-1]
    total = jnp.sum(elementwise * mask_f)
    # Guard against all-masked batches (reference returns 0.0 in that case).
    return jnp.where(num_valid > 0, total / jnp.maximum(num_valid, 1.0), 0.0)
