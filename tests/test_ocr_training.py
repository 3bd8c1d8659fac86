"""OCR recognizer trainability: CTC loss must drive learning.

The reference consumes pretrained Paddle/VietOCR weights it cannot train;
this framework's recognizer must be trainable in-framework (optax.ctc_loss
against the CRNN+transformer logits). A tiny synthetic glyph task: each
"character" is a distinct vertical-bar pattern; the net must learn to read
2-glyph strings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spine_vision_tpu.models.textrec import (
    BLANK_ID,
    TextRecognitionNet,
    ctc_greedy_decode,
)

H, W = 32, 64
NUM_GLYPHS = 4  # maps to charset chars '0'..'3' -> logit ids 1..4


def _render(glyph_ids):
    """Two glyphs side by side; glyph g = g+1 bars in its half."""
    img = np.zeros((H, W), dtype=np.float32)
    for pos, g in enumerate(glyph_ids):
        x0 = pos * (W // 2)
        for bar in range(g + 1):
            x = x0 + 4 + bar * 6
            img[4:28, x : x + 3] = 255.0
    return img


def _batch(rng, n):
    labels = rng.integers(0, NUM_GLYPHS, size=(n, 2))
    images = np.stack([_render(row) for row in labels])
    return images, labels


def test_ctc_training_learns_synthetic_glyphs():
    model = TextRecognitionNet(width=16, num_layers=1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    images, labels = _batch(rng, 64)
    x = jnp.asarray(images / 255.0)[..., None]
    # CTC targets: char '0'..'3' => logit id (charset index + 1) = digit + 1
    targets = jnp.asarray(labels + 1, dtype=jnp.int32)
    target_pad = jnp.zeros_like(targets, dtype=jnp.float32)  # no padding

    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        t = logits.shape[1]
        logit_pad = jnp.zeros((logits.shape[0], t), dtype=jnp.float32)
        loss = optax.ctc_loss(
            logits, logit_pad, targets, target_pad, blank_id=BLANK_ID
        ).mean()
        return loss, updates["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses = []
    for _ in range(60):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # Greedy decode should now read most training strings.
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    decoded = ctc_greedy_decode(np.asarray(logits))
    want = ["".join(str(d) for d in row) for row in labels]
    accuracy = np.mean([d == w for d, w in zip(decoded, want)])
    assert accuracy > 0.5, (accuracy, decoded[:5], want[:5])
