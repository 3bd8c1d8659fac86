"""Golden tests for the fused IVD crop kernel against the reference cv2 chain.

The golden implementation below reproduces the reference's host-side crop
pipeline exactly (cropping.py:258-354): cv2 warpAffine rotation with
BORDER_REPLICATE, clipped axis-aligned crop, min-max uint8 normalization, and
letterboxed resize. Our fused device kernel must match within quantization
tolerance.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from spine_vision_tpu.ops import crop_ivd_regions

RNG = np.random.RandomState(7)


def ref_normalize_to_uint8(arr):
    arr = arr.astype(np.float32)
    arr_min, arr_max = arr.min(), arr.max()
    if arr_max - arr_min > 0:
        arr = (arr - arr_min) / (arr_max - arr_min) * 255
    return arr.astype(np.uint8)


def ref_resize_with_padding(image, target_size):
    h, w = image.shape[:2]
    target_h, target_w = target_size
    scale = min(target_h / h, target_w / w)
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    if resized.dtype != np.uint8:
        resized = ref_normalize_to_uint8(resized)
    canvas = np.zeros((target_h, target_w), dtype=np.uint8)
    y_offset = (target_h - new_h) // 2
    x_offset = (target_w - new_w) // 2
    canvas[y_offset : y_offset + new_h, x_offset : x_offset + new_w] = resized
    return canvas


def ref_crop(image, center_x, center_y, crop_size, crop_delta, rotation_angle):
    """Reference crop_region_rotated / crop_region_horizontal (angle=0)."""
    h, w = image.shape[:2]
    cx = int(center_x * w)
    cy = int(center_y * h)
    left, right, top, bottom = crop_delta
    if rotation_angle != 0.0:
        rotation_matrix = cv2.getRotationMatrix2D((cx, cy), rotation_angle, 1.0)
        work = cv2.warpAffine(
            image,
            rotation_matrix,
            (w, h),
            flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REPLICATE,
        )
    else:
        work = image
    x1 = max(0, cx - left)
    x2 = min(w, cx + right)
    y1 = max(0, cy - top)
    y2 = min(h, cy + bottom)
    crop = work[y1:y2, x1:x2]
    crop_uint8 = ref_normalize_to_uint8(crop)
    return ref_resize_with_padding(crop_uint8, crop_size)


def _compare(ours, ref, frac_tol=0.02, max_err=6):
    """Crops must match the golden pixelwise up to interpolation/quantization
    differences: nearly all pixels within a few gray levels."""
    diff = np.abs(ours.astype(int) - ref.astype(int))
    frac_bad = (diff > max_err).mean()
    assert frac_bad < frac_tol, f"{frac_bad:.4f} of pixels differ by >{max_err}"
    assert np.median(diff) <= 1


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.3, 0.7), (0.05, 0.1)])
def test_horizontal_crop_matches_reference(center):
    image = (RNG.rand(200, 180) * 400 - 100).astype(np.float32)
    delta = (40, 20, 15, 25)
    ref = ref_crop(image, center[0], center[1], (64, 64), delta, 0.0)
    ours = np.asarray(
        crop_ivd_regions(
            jnp.array(image),
            jnp.array([center], dtype=jnp.float32),
            jnp.zeros((1,), dtype=jnp.float32),
            jnp.array(delta, dtype=jnp.float32),
            crop_h=64,
            crop_w=64,
        )
    )[0]
    _compare(ours, ref)


@pytest.mark.parametrize("angle", [-15.0, 8.5, 30.0])
def test_rotated_crop_matches_reference(angle):
    # Smooth image so interpolation-order differences stay small.
    yy, xx = np.mgrid[0:200, 0:180].astype(np.float32)
    image = np.sin(yy / 17.0) * 80 + np.cos(xx / 23.0) * 60 + yy * 0.3

    center = (0.45, 0.55)
    delta = (50, 25, 18, 22)
    ref = ref_crop(image, center[0], center[1], (64, 64), delta, angle)
    ours = np.asarray(
        crop_ivd_regions(
            jnp.array(image),
            jnp.array([center], dtype=jnp.float32),
            jnp.array([angle], dtype=jnp.float32),
            jnp.array(delta, dtype=jnp.float32),
            crop_h=64,
            crop_w=64,
        )
    )[0]
    _compare(ours, ref)


def test_multi_level_batch_shape_and_padded_image():
    image = RNG.rand(150, 120).astype(np.float32)
    padded = np.zeros((256, 256), dtype=np.float32)
    padded[:150, :120] = image
    centers = np.array([[0.5, 0.25], [0.5, 0.4], [0.5, 0.55], [0.5, 0.7], [0.5, 0.85]])
    out = np.asarray(
        crop_ivd_regions(
            jnp.array(padded),
            jnp.array(centers, dtype=jnp.float32),
            jnp.zeros((5,), dtype=jnp.float32),
            jnp.array([30, 15, 10, 12], dtype=jnp.float32),
            crop_h=64,
            crop_w=64,
            image_hw=jnp.array([150, 120]),
        )
    )
    assert out.shape == (5, 64, 64)
    assert out.dtype == np.uint8

    # Must equal the unpadded result exactly.
    out_unpadded = np.asarray(
        crop_ivd_regions(
            jnp.array(image),
            jnp.array(centers, dtype=jnp.float32),
            jnp.zeros((5,), dtype=jnp.float32),
            jnp.array([30, 15, 10, 12], dtype=jnp.float32),
            crop_h=64,
            crop_w=64,
        )
    )
    np.testing.assert_array_equal(out, out_unpadded)


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.3, 0.7)])
def test_separable_path_matches_gather_path(center):
    image = (RNG.rand(180, 160) * 300 - 50).astype(np.float32)
    delta = jnp.array([40, 20, 15, 25], dtype=jnp.float32)
    centers = jnp.array([center], dtype=jnp.float32)
    angles = jnp.zeros((1,), dtype=jnp.float32)
    a = np.asarray(
        crop_ivd_regions(
            jnp.array(image), centers, angles, delta, crop_h=64, crop_w=64
        )
    )
    b = np.asarray(
        crop_ivd_regions(
            jnp.array(image), centers, angles, delta,
            crop_h=64, crop_w=64, separable=True,
        )
    )
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1  # identical up to float-accumulation rounding


@pytest.mark.parametrize("angle", [-38.0, 22.0])
@pytest.mark.parametrize("center", [(0.5, 0.5), (0.25, 0.7)])
def test_shear_rotation_matches_cv2_warpaffine(angle, center):
    """The 3-shear gather-free rotation must reproduce cv2.warpAffine
    (BORDER_REPLICATE) away from the replicate border."""
    from spine_vision_tpu.ops.crop import _rotate_about_replicate

    yy, xx = np.mgrid[0:160, 0:220].astype(np.float32)
    image = np.sin(yy / 13.0) * 70 + np.cos(xx / 19.0) * 50 + xx * 0.2

    h, w = image.shape
    cx, cy = int(center[0] * w), int(center[1] * h)
    mat = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    ref = cv2.warpAffine(
        image, mat, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE,
    )
    ours = np.asarray(
        _rotate_about_replicate(
            jnp.asarray(image), jnp.int32(h), jnp.int32(w),
            jnp.float32(cx), jnp.float32(cy), jnp.float32(angle), 40.0, 512.0,
        )
    )
    # Compare where the full 3-shear sampling path stays interior: the
    # multi-pass scheme replicates at *intermediate* positions, so pixels
    # whose shear path leaves the image differ from cv2's final-position
    # replicate by construction (only crop rects hugging the border see it).
    theta = np.deg2rad(angle)
    alpha, beta = -np.tan(theta / 2.0), np.sin(theta)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    x2 = xs + alpha * (ys - cy)
    y1 = ys + beta * (x2 - cx)
    x0 = x2 + alpha * (y1 - cy)
    interior = np.ones((h, w), bool)
    for arr, lim in ((x2, w), (x0, w), (y1, h)):
        interior &= (arr > 2) & (arr < lim - 3)
    diff = np.abs(ours - ref)[interior]
    assert np.median(diff) < 0.5, np.median(diff)
    assert np.percentile(diff, 99) < 4.0, np.percentile(diff, 99)
