"""Text-detector trainability: BCE on the probability map drives learning.

Synthetic task: images with bright text-like bars; the target map marks the
(downscaled) bar regions. Loss must drop and the box extractor must find
the trained regions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spine_vision_tpu.models.textdet import (
    TextDetectionNet,
    extract_boxes_from_probmap,
)

H, W = 64, 96


def _sample(rng):
    img = rng.normal(0.1, 0.02, (H, W)).astype(np.float32)
    target = np.zeros((H // 2, W // 2), dtype=np.float32)
    y = int(rng.integers(8, H - 16))
    x = int(rng.integers(8, W - 40))
    img[y : y + 8, x : x + 32] = 1.0
    target[y // 2 : (y + 8) // 2, x // 2 : (x + 32) // 2] = 1.0
    return img, target


def test_detector_learns_bar_regions():
    rng = np.random.default_rng(0)
    samples = [_sample(rng) for _ in range(32)]
    x = jnp.asarray(np.stack([s[0] for s in samples]))[..., None]
    y = jnp.asarray(np.stack([s[1] for s in samples]))[..., None]

    model = TextDetectionNet(width=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats):
        prob, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        eps = 1e-6
        bce = -(y * jnp.log(prob + eps) + (1 - y) * jnp.log(1 - prob + eps))
        return bce.mean(), updates["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses = []
    for _ in range(50):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # The trained map should localize a held-out bar.
    img, target = _sample(np.random.default_rng(99))
    prob = np.asarray(
        model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(img)[None, ..., None],
            train=False,
        )
    )[0, :, :, 0]
    boxes = extract_boxes_from_probmap(prob, threshold=0.5, min_area=8, scale=2.0)
    assert len(boxes) >= 1
    ys, xs = np.nonzero(target > 0)
    cy, cx = ys.mean() * 2, xs.mean() * 2  # target center in image coords
    centers = boxes.mean(axis=1)  # [N, 2] (x, y)
    dists = np.hypot(centers[:, 0] - cx, centers[:, 1] - cy)
    assert dists.min() < 16, (boxes, (cx, cy))
