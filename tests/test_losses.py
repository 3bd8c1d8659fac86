"""Parity tests for ops.losses against torch reference semantics.

torch (CPU) is available in the environment, so we check our jnp losses
numerically match the torch ops the reference uses
(BCEWithLogitsLoss, CrossEntropyLoss(label_smoothing), SmoothL1Loss,
HuberLoss(delta=0.1), MSELoss, and the reference FocalLoss formula).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from spine_vision_tpu.ops import losses as L

RNG = np.random.RandomState(0)


def test_bce_with_logits_matches_torch():
    logits = RNG.randn(16, 1).astype(np.float32)
    targets = RNG.randint(0, 2, (16, 1)).astype(np.float32)
    ours = np.mean(np.asarray(L.binary_cross_entropy_with_logits(jnp.array(logits), jnp.array(targets))))
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    assert abs(ours - ref) < 5e-5


def test_bce_pos_weight_matches_torch():
    logits = RNG.randn(8, 1).astype(np.float32)
    targets = RNG.randint(0, 2, (8, 1)).astype(np.float32)
    ours = np.mean(
        np.asarray(
            L.binary_cross_entropy_with_logits(
                jnp.array(logits), jnp.array(targets), pos_weight=3.0
            )
        )
    )
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), pos_weight=torch.tensor(3.0)
    ).item()
    assert abs(ours - ref) < 5e-5


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_softmax_ce_matches_torch(smoothing):
    logits = RNG.randn(10, 5).astype(np.float32)
    labels = RNG.randint(0, 5, (10,))
    ours = np.mean(
        np.asarray(
            L.softmax_cross_entropy(
                jnp.array(logits), jnp.array(labels), label_smoothing=smoothing
            )
        )
    )
    ref = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), label_smoothing=smoothing
    ).item()
    assert abs(ours - ref) < 5e-5


def test_smooth_l1_matches_torch():
    preds = RNG.randn(6, 5, 2).astype(np.float32)
    targets = RNG.randn(6, 5, 2).astype(np.float32)
    ours = np.mean(np.asarray(L.smooth_l1_loss(jnp.array(preds), jnp.array(targets))))
    ref = F.smooth_l1_loss(torch.tensor(preds), torch.tensor(targets)).item()
    assert abs(ours - ref) < 1e-6


def test_huber_matches_torch():
    preds = RNG.randn(6, 5, 2).astype(np.float32) * 0.2
    targets = RNG.randn(6, 5, 2).astype(np.float32) * 0.2
    ours = np.mean(np.asarray(L.huber_loss(jnp.array(preds), jnp.array(targets), delta=0.1)))
    ref = F.huber_loss(torch.tensor(preds), torch.tensor(targets), delta=0.1).item()
    assert abs(ours - ref) < 1e-6


def test_focal_loss_matches_reference_formula():
    """Reference formula (training/losses.py:90-139): (1-p_t)^gamma * BCE, with
    optional alpha weighting alpha*t + (1-alpha)*(1-t)."""
    logits = RNG.randn(32, 1).astype(np.float32)
    targets = RNG.randint(0, 2, (32, 1)).astype(np.float32)
    gamma, alpha = 2.0, 0.25

    t_logits = torch.tensor(logits)
    t_targets = torch.tensor(targets)
    probs = torch.sigmoid(t_logits)
    p_t = probs * t_targets + (1 - probs) * (1 - t_targets)
    focal_weight = (1 - p_t) ** gamma
    bce = F.binary_cross_entropy_with_logits(t_logits, t_targets, reduction="none")
    ref = ((alpha * t_targets + (1 - alpha) * (1 - t_targets)) * focal_weight * bce).mean().item()

    ours = float(
        L.focal_loss_with_logits(
            jnp.array(logits), jnp.array(targets), gamma=gamma, alpha=alpha
        )
    )
    assert abs(ours - ref) < 5e-5


def test_masked_coordinate_loss_matches_dense_subset():
    """Masked loss over [B,5,2] equals dense loss over only the valid rows
    (the reference gathers valid entries; we mask-and-normalize)."""
    preds = RNG.rand(4, 5, 2).astype(np.float32)
    targets = RNG.rand(4, 5, 2).astype(np.float32)
    mask = RNG.randint(0, 2, (4, 5)).astype(np.float32)
    mask[0, 0] = 1.0  # ensure at least one valid

    ours = float(
        L.masked_coordinate_loss(
            jnp.array(preds), jnp.array(targets), jnp.array(mask), "smooth_l1"
        )
    )

    valid = mask.astype(bool)
    ref = F.smooth_l1_loss(
        torch.tensor(preds[valid]), torch.tensor(targets[valid])
    ).item()
    assert abs(ours - ref) < 1e-6


def test_masked_coordinate_loss_all_masked_returns_zero():
    preds = jnp.ones((2, 5, 2))
    targets = jnp.zeros((2, 5, 2))
    mask = jnp.zeros((2, 5))
    assert float(L.masked_coordinate_loss(preds, targets, mask)) == 0.0
