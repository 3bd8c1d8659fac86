"""On-device, coordinate-aware data augmentation.

The reference augments on the host with torchvision (RandomHorizontalFlip,
RandomAffine(±10°, 5% translate, 0.95-1.05 scale), ColorJitter(brightness/
contrast 0.2)) — and, for localization, does NOT transform the coordinate
targets under geometric augs (training/datasets/localization.py:196-233),
making labels inconsistent. This module fixes that by construction: the same
sampled affine transforms both the image (inverse-warp bilinear sampling) and
the normalized coordinates (forward map), entirely on device inside the jitted
train step — augmentation rides the TPU instead of host worker processes, and
batches cross PCIe as uint8.

Conventions: images are [B, H, W, C] float in [0, 1]; coordinates are
[B, L, 2] normalized (x, y). Affine parameters follow torchvision semantics:
rotation about the image center, translation as a fraction of width/height,
isotropic scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class AugmentConfig(NamedTuple):
    """Augmentation hyperparameters (torchvision-parity defaults)."""

    hflip_prob: float = 0.5
    degrees: float = 10.0
    translate: float = 0.05
    scale_min: float = 0.95
    scale_max: float = 1.05
    brightness: float = 0.2
    contrast: float = 0.2
    flip_coords: bool = True  # transform coords under flip (localization)


def _affine_params(key: Array, batch: int, cfg: AugmentConfig) -> tuple[Array, ...]:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    theta = jnp.deg2rad(
        jax.random.uniform(k1, (batch,), minval=-cfg.degrees, maxval=cfg.degrees)
    )
    tx = jax.random.uniform(k2, (batch,), minval=-cfg.translate, maxval=cfg.translate)
    ty = jax.random.uniform(k3, (batch,), minval=-cfg.translate, maxval=cfg.translate)
    scale = jax.random.uniform(
        k4, (batch,), minval=cfg.scale_min, maxval=cfg.scale_max
    )
    flip = jax.random.bernoulli(k5, cfg.hflip_prob, (batch,))
    brightness = jax.random.uniform(
        k6, (batch,), minval=1.0 - cfg.brightness, maxval=1.0 + cfg.brightness
    )
    contrast = jax.random.uniform(
        k7, (batch,), minval=1.0 - cfg.contrast, maxval=1.0 + cfg.contrast
    )
    return theta, tx, ty, scale, flip, brightness, contrast


def _warp_one(
    image: Array,
    theta: Array,
    tx: Array,
    ty: Array,
    scale: Array,
    flip: Array,
) -> Array:
    """Inverse-warp one [H, W, C] image under flip+rotate+scale+translate."""
    h, w, _ = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    oy = jnp.arange(h, dtype=jnp.float32)[:, None]
    ox = jnp.arange(w, dtype=jnp.float32)[None, :]
    # Centered output coordinates.
    yc = jnp.broadcast_to(oy - cy, (h, w))
    xc = jnp.broadcast_to(ox - cx, (h, w))
    # Undo translation (pixels), then inverse rotate+scale.
    xs_t = xc - tx * w
    ys_t = yc - ty * h
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    inv_scale = 1.0 / scale
    xs = (cos_t * xs_t + sin_t * ys_t) * inv_scale + cx
    ys = (-sin_t * xs_t + cos_t * ys_t) * inv_scale + cy
    # Undo horizontal flip.
    xs = jnp.where(flip, (w - 1.0) - xs, xs)

    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _transform_coords(
    coords: Array,
    theta: Array,
    tx: Array,
    ty: Array,
    scale: Array,
    flip: Array,
    h: int,
    w: int,
) -> Array:
    """Forward-map [L, 2] normalized coords under the same transform.

    Rotation happens in aspect-corrected (pixel-proportional) space so the
    coordinate map matches the image warp for non-square sizes; rotating raw
    normalized units would diverge from ``_warp_one``'s pixel-space rotation
    whenever h != w.
    """
    x = coords[:, 0]
    y = coords[:, 1]
    x = jnp.where(flip, 1.0 - x, x)
    xp = (x - 0.5) * w
    yp = (y - 0.5) * h
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    xr = (cos_t * xp - sin_t * yp) * scale
    yr = (sin_t * xp + cos_t * yp) * scale
    return jnp.stack([xr / w + 0.5 + tx, yr / h + 0.5 + ty], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    key: Array,
    images: Array,
    coords: Array | None = None,
    cfg: AugmentConfig = AugmentConfig(),
) -> tuple[Array, Array | None]:
    """Augment a batch of images (and optionally their coordinate targets).

    Args:
        key: PRNG key.
        images: [B, H, W, C] float images in [0, 1].
        coords: Optional [B, L, 2] normalized coordinates transformed
            consistently with the images.
        cfg: Augmentation configuration (static).

    Returns:
        (augmented images, transformed coords or None).
    """
    b = images.shape[0]
    theta, tx, ty, scale, flip, brightness, contrast = _affine_params(key, b, cfg)
    if cfg.hflip_prob <= 0.0:
        flip = jnp.zeros_like(flip)

    warped = jax.vmap(_warp_one)(images, theta, tx, ty, scale, flip)

    # Color jitter (torchvision order: brightness then contrast).
    bright = warped * brightness[:, None, None, None]
    mean = jnp.mean(bright, axis=(1, 2, 3), keepdims=True)
    jittered = (bright - mean) * contrast[:, None, None, None] + mean
    out_images = jnp.clip(jittered, 0.0, 1.0)

    out_coords = None
    if coords is not None:
        h, w = images.shape[1], images.shape[2]
        coord_flip = flip if cfg.flip_coords else jnp.zeros_like(flip)
        out_coords = jax.vmap(
            functools.partial(_transform_coords, h=h, w=w)
        )(coords, theta, tx, ty, scale, coord_flip)
    return out_images, out_coords
