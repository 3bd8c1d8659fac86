"""Coordinate-aware augmentation: labels must track the warped image.

This is the property the reference gets wrong (geometric augs don't touch
the coordinate targets, training/datasets/localization.py:196-233) — here a
bright dot placed at the target coordinate must end up at the transformed
coordinate after augmentation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.ops.augment import AugmentConfig, augment_batch

H = W = 96


def _dot_image(x_norm, y_norm):
    img = np.zeros((H, W, 1), dtype=np.float32)
    px, py = int(x_norm * W), int(y_norm * H)
    img[py - 1 : py + 2, px - 1 : px + 2] = 1.0
    return img


def _argmax_coords(image):
    flat = np.asarray(image[..., 0])
    idx = np.unravel_index(np.argmax(flat), flat.shape)
    return idx[1] / W, idx[0] / H  # (x_norm, y_norm)


def test_dot_tracks_transformed_coords():
    rng = np.random.default_rng(0)
    centers = [(0.5, 0.5), (0.35, 0.6), (0.6, 0.4)]
    images = jnp.asarray(np.stack([_dot_image(x, y) for x, y in centers]))
    coords = jnp.asarray(np.asarray(centers, dtype=np.float32)[:, None, :])

    cfg = AugmentConfig(
        hflip_prob=0.5, degrees=15.0, translate=0.08,
        scale_min=0.9, scale_max=1.1, brightness=0.0, contrast=0.0,
    )
    for seed in range(4):
        out_images, out_coords = augment_batch(
            jax.random.PRNGKey(seed), images, coords, cfg
        )
        out_images = np.asarray(out_images)
        out_coords = np.asarray(out_coords)
        for i in range(len(centers)):
            got_x, got_y = _argmax_coords(out_images[i])
            want_x, want_y = out_coords[i, 0]
            # Within ~2 pixels (dot width + half-pixel center conventions).
            assert abs(got_x - want_x) < 2.5 / W, (seed, i, got_x, want_x)
            assert abs(got_y - want_y) < 2.5 / H, (seed, i, got_y, want_y)


def test_dot_tracks_transformed_coords_nonsquare():
    """Rotation must stay label-consistent for h != w (coords rotate in
    aspect-corrected space, matching the pixel-space image warp)."""
    h, w = 64, 128
    centers = [(0.5, 0.5), (0.3, 0.65), (0.7, 0.35)]

    def dot(x_norm, y_norm):
        img = np.zeros((h, w, 1), dtype=np.float32)
        px, py = int(x_norm * w), int(y_norm * h)
        img[py - 1 : py + 2, px - 1 : px + 2] = 1.0
        return img

    images = jnp.asarray(np.stack([dot(x, y) for x, y in centers]))
    coords = jnp.asarray(np.asarray(centers, dtype=np.float32)[:, None, :])
    cfg = AugmentConfig(
        hflip_prob=0.5, degrees=15.0, translate=0.08,
        scale_min=0.9, scale_max=1.1, brightness=0.0, contrast=0.0,
    )
    for seed in range(4):
        out_images, out_coords = augment_batch(
            jax.random.PRNGKey(seed), images, coords, cfg
        )
        out_images = np.asarray(out_images)
        out_coords = np.asarray(out_coords)
        for i in range(len(centers)):
            flat = out_images[i, ..., 0]
            idx = np.unravel_index(np.argmax(flat), flat.shape)
            got_x, got_y = idx[1] / w, idx[0] / h
            want_x, want_y = out_coords[i, 0]
            assert abs(got_x - want_x) < 2.5 / w, (seed, i, got_x, want_x)
            assert abs(got_y - want_y) < 2.5 / h, (seed, i, got_y, want_y)


def test_flip_coords_disabled_keeps_targets():
    images = jnp.asarray(np.stack([_dot_image(0.3, 0.5)]))
    coords = jnp.asarray(np.asarray([[[0.3, 0.5]]], dtype=np.float32))
    cfg = AugmentConfig(
        hflip_prob=0.0, degrees=0.0, translate=0.0,
        scale_min=1.0, scale_max=1.0, brightness=0.0, contrast=0.0,
        flip_coords=False,
    )
    out_images, out_coords = augment_batch(jax.random.PRNGKey(0), images, coords, cfg)
    np.testing.assert_allclose(np.asarray(out_coords), np.asarray(coords), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_images), np.asarray(images), atol=1e-5
    )


def test_color_jitter_preserves_geometry():
    images = jnp.asarray(np.stack([_dot_image(0.5, 0.5)]))
    cfg = AugmentConfig(
        hflip_prob=0.0, degrees=0.0, translate=0.0,
        scale_min=1.0, scale_max=1.0, brightness=0.3, contrast=0.3,
    )
    out_images, _ = augment_batch(jax.random.PRNGKey(1), images, None, cfg)
    got = _argmax_coords(np.asarray(out_images)[0])
    assert abs(got[0] - 0.5) < 2.0 / W and abs(got[1] - 0.5) < 2.0 / H
