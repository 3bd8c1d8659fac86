"""Jitted image ops: normalization, bilinear resize, letterboxing.

Device-side replacements for the reference's numpy/cv2 hot paths:

- ``normalize_to_uint8``: min-max to [0,255] (reference io/__init__.py:15-31),
  used in every image path; here a fused VPU op.
- ``bilinear_resize``: cv2.INTER_LINEAR-compatible sampling
  (half-pixel-center convention).
- ``resize_with_padding``: letterbox onto a zero canvas
  (reference datasets/classification/cropping.py:104-146).

All functions are pure and shape-static, so they can be jitted and fused by
XLA. numpy inputs are accepted (traced as constants outside jit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def normalize_minmax(arr: Array) -> Array:
    """Min-max normalize to [0, 1] float32 (flat image if constant)."""
    arr = arr.astype(jnp.float32)
    amin = jnp.min(arr)
    amax = jnp.max(arr)
    rng = amax - amin
    return jnp.where(rng > 0, (arr - amin) / jnp.maximum(rng, 1e-12), arr * 0.0)


def normalize_to_uint8(arr: Array) -> Array:
    """Min-max normalize to [0, 255] uint8.

    Matches reference semantics exactly (io/__init__.py:15-31): when the
    array is constant, the RAW values are truncated to uint8 (a flat slice
    of 100.0 stays 100, it does not become 0); otherwise
    ``(x - min) / (max - min) * 255`` with truncation toward zero.
    """
    arr = arr.astype(jnp.float32)
    amin = jnp.min(arr)
    amax = jnp.max(arr)
    rng = amax - amin
    scaled = (arr - amin) / jnp.maximum(rng, 1e-12) * 255.0
    out = jnp.where(rng > 0, scaled, arr)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def _source_coords(out_size: int, in_size, dtype=jnp.float32) -> Array:
    """Half-pixel-center source coordinates for resizing (cv2/TF convention).

    src = (dst + 0.5) * (in / out) - 0.5
    """
    scale = jnp.asarray(in_size, dtype) / out_size
    idx = jnp.arange(out_size, dtype=dtype)
    return (idx + 0.5) * scale - 0.5


def bilinear_sample(image: Array, ys: Array, xs: Array) -> Array:
    """Bilinear sample a 2D image at float coordinates with edge clamping.

    Args:
        image: [H, W] array (any float/int dtype; promoted to float32).
        ys, xs: Broadcastable float coordinate arrays (same shape).

    Returns:
        Sampled values, float32, shape ``ys.shape``.
    """
    image = image.astype(jnp.float32)
    h, w = image.shape
    # Clamp coordinates first so out-of-range samples replicate the border
    # (cv2 BORDER_REPLICATE semantics).
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def bilinear_resize(image: Array, out_h: int, out_w: int) -> Array:
    """Resize a 2D image with bilinear interpolation (cv2.INTER_LINEAR compatible).

    Args:
        image: [H, W] input.
        out_h, out_w: Static output size.

    Returns:
        [out_h, out_w] float32.
    """
    ys = _source_coords(out_h, image.shape[0])
    xs = _source_coords(out_w, image.shape[1])
    return bilinear_sample(image, ys[:, None], xs[None, :])


def resize_dynamic(image: Array, hw: Array, out_h: int, out_w: int) -> Array:
    """Bilinear-resize the valid [0:h, 0:w] region of a padded image.

    Jit-compatible with a traced extent: ``image`` is a statically-shaped
    (possibly padded) buffer and ``hw`` the actual (h, w). Used by the fused
    study graph where per-study slice sizes vary but compiled shapes must not
    (the reference resizes each slice with torchvision before localization,
    cropping.py:455-460).

    Bilinear interpolation is expressed as two dense matmuls with triangle
    (hat-function) weight matrices instead of XLA gathers: each output pixel
    has weight ``max(0, 1 - |src - j|)`` against row/col j, which is exactly
    the bilinear kernel. Gathers serialize on TPU (measured ~200 ms for
    16x 768->512 resizes on v5e); the MXU form is ~two orders faster.

    Args:
        image: [Hp, Wp] padded buffer.
        hw: [2] actual (h, w), integer-valued (traced).
        out_h, out_w: Static output size.

    Returns:
        [out_h, out_w] float32.
    """
    image = image.astype(jnp.float32)
    hp, wp = image.shape
    hf = hw[0].astype(jnp.float32)
    wf = hw[1].astype(jnp.float32)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (hf / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (wf / out_w) - 0.5
    ys = jnp.clip(ys, 0.0, hf - 1.0)
    xs = jnp.clip(xs, 0.0, wf - 1.0)

    rows = jnp.arange(hp, dtype=jnp.float32)
    cols = jnp.arange(wp, dtype=jnp.float32)
    # [out_h, Hp] and [out_w, Wp] hat-function interpolation matrices.
    r_mat = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - rows[None, :]))
    c_mat = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - cols[None, :]))
    return r_mat @ image @ c_mat.T


@functools.partial(jax.jit, static_argnames=("target_h", "target_w"))
def resize_with_padding(image: Array, target_h: int, target_w: int) -> Array:
    """Letterbox a 2D image onto a zero canvas without distortion.

    Scales so the image fits inside (target_h, target_w) preserving aspect
    ratio, centers it, and zero-pads the rest. Matching the reference
    (cropping.py:104-146): uint8 inputs keep their pixel values; other
    dtypes are min-max normalized to uint8 first.

    Implemented as a single fused sampling pass: each output pixel either maps
    back into the source image (bilinear sample) or is padding (zero) —
    no intermediate resized buffer.

    Args:
        image: [H, W] input (any numeric dtype).
        target_h, target_w: Static output size.

    Returns:
        [target_h, target_w] uint8.
    """
    h, w = image.shape
    scale = min(target_h / h, target_w / w)
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    y_off = (target_h - new_h) // 2
    x_off = (target_w - new_w) // 2

    # Map output pixel -> source coordinate (half-pixel centers, like the
    # cv2.resize the reference uses), valid only inside the letterbox window.
    oy = jnp.arange(target_h, dtype=jnp.float32)[:, None]
    ox = jnp.arange(target_w, dtype=jnp.float32)[None, :]
    sy = (oy - y_off + 0.5) * (h / new_h) - 0.5
    sx = (ox - x_off + 0.5) * (w / new_w) - 0.5
    valid = (
        (oy >= y_off)
        & (oy < y_off + new_h)
        & (ox >= x_off)
        & (ox < x_off + new_w)
    )

    if image.dtype == jnp.uint8:
        source = image.astype(jnp.float32)  # reference keeps uint8 values
    else:
        # Same flat-array semantics as normalize_to_uint8 (and the
        # reference, cropping.py:135): a constant image keeps its raw
        # values instead of collapsing to black.
        f = image.astype(jnp.float32)
        source = jnp.where(
            jnp.max(f) - jnp.min(f) > 0, normalize_minmax(image) * 255.0, f
        )
    sampled = bilinear_sample(
        source,
        jnp.broadcast_to(sy, (target_h, target_w)),
        jnp.broadcast_to(sx, (target_h, target_w)),
    )
    out = jnp.where(valid, sampled, 0.0)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def imagenet_normalize(images: Array) -> Array:
    """Normalize [..., H, W, 3] float images in [0,1] with ImageNet stats.

    Reference uses torchvision Normalize(mean, std) everywhere
    (e.g. training/datasets/localization.py:224-232).
    """
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=images.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=images.dtype)
    return (images - mean) / std


def grayscale_to_rgb01(image_u8: Array) -> Array:
    """uint8 [H, W] grayscale -> float32 [H, W, 3] in [0, 1]."""
    f = image_u8.astype(jnp.float32) / 255.0
    return jnp.stack([f, f, f], axis=-1)
