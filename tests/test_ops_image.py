"""Golden tests for ops.image / ops.geometry / ops.resample against cv2/scipy.

cv2 is available in the environment and is exactly what the reference uses on
the host, so it serves as the golden implementation for resize/letterbox/warp
semantics.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from spine_vision_tpu.ops import (
    bilinear_resize,
    get_rotation_angles,
    mm_to_pixels,
    normalize_to_uint8,
    resample_to_isotropic,
    resize_with_padding,
)

RNG = np.random.RandomState(42)


def ref_normalize_to_uint8(arr):
    """Reference formula (io/__init__.py:15-31)."""
    arr = arr.astype(np.float32)
    arr_min, arr_max = arr.min(), arr.max()
    if arr_max - arr_min > 0:
        arr = (arr - arr_min) / (arr_max - arr_min) * 255
    return arr.astype(np.uint8)


def test_normalize_to_uint8_matches_reference():
    arr = RNG.randn(64, 48).astype(np.float32) * 100 + 50
    ours = np.asarray(normalize_to_uint8(jnp.array(arr)))
    ref = ref_normalize_to_uint8(arr)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_normalize_to_uint8_constant_image():
    # Reference semantics (io/__init__.py:15-31): constant arrays keep their
    # raw values truncated to uint8, they are NOT zeroed.
    arr = np.full((8, 8), 7.0, dtype=np.float32)
    ours = np.asarray(normalize_to_uint8(jnp.array(arr)))
    assert ours.min() == 7 and ours.max() == 7
    big = np.full((4, 4), 300.0, dtype=np.float32)
    assert np.asarray(normalize_to_uint8(jnp.array(big))).max() == 255


def test_bilinear_resize_matches_cv2():
    img = RNG.rand(37, 53).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.array(img), 64, 96))
    ref = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 1e-3


def ref_resize_with_padding(image, target_size):
    """Reference letterbox (cropping.py:104-146), uint8 input path."""
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


@pytest.mark.parametrize("shape", [(100, 60), (60, 100), (128, 128)])
def test_resize_with_padding_matches_reference(shape):
    # Input is already uint8 (the common reference path feeds uint8 crops).
    img = (RNG.rand(*shape) * 255).astype(np.uint8)
    ours = np.asarray(resize_with_padding(jnp.array(img), 64, 64))
    ref = ref_resize_with_padding(img, (64, 64))
    # Our fused path resizes float-normalized values then quantizes once;
    # reference quantizes before resizing. Allow small quantization slack.
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 2
    # Padding (zero) regions must match exactly.
    assert ((ref == 0) & (diff > 0)).sum() == 0


def test_resize_with_padding_flat_float_keeps_raw_values():
    """A constant non-uint8 image keeps its raw gray level (reference
    normalize_to_uint8 passes flat arrays through) instead of collapsing
    to a black canvas."""
    img = np.full((40, 80), 100.0, dtype=np.float32)
    out = np.asarray(resize_with_padding(jnp.array(img), 64, 64))
    inner = out[16:48, :]  # the letterboxed content rows
    assert inner.min() == inner.max() == 100
    assert out[:16].max() == 0 and out[48:].max() == 0  # padding stays zero


def test_mm_to_pixels():
    # spacing (row, col) = (0.5, 0.25): horizontal deltas / col, vertical / row
    assert mm_to_pixels((55, 15, 17.5, 20), (0.5, 0.25)) == (220, 60, 35, 40)


def test_rotation_angles_straight_spine_is_zero():
    locs = {i: (0.5, 0.2 + 0.1 * i) for i in range(5)}
    angles = get_rotation_angles(locs, (512, 512))
    for v in angles.values():
        assert abs(v) < 1e-6


def test_rotation_angles_tilted_spine():
    # Spine leaning right: x increases with y -> dx/dy > 0 -> negative angle.
    locs = {i: (0.4 + 0.05 * i, 0.2 + 0.1 * i) for i in range(5)}
    angles = get_rotation_angles(locs, (512, 512))
    expected = -np.degrees(np.arctan(0.05 / 0.1))
    for i in range(5):
        assert abs(angles[i] - expected) < 1e-4


def test_rotation_angles_boost_applies_to_last_only():
    locs = {i: (0.4 + 0.05 * i, 0.2 + 0.1 * i) for i in range(5)}
    base = get_rotation_angles(locs, (512, 512), last_disc_angle_boost=1.0)
    boosted = get_rotation_angles(locs, (512, 512), last_disc_angle_boost=2.0)
    assert abs(boosted[4] - 2 * base[4]) < 1e-6
    for i in range(4):
        assert abs(boosted[i] - base[i]) < 1e-9


def test_rotation_angles_fewer_than_two_points():
    assert get_rotation_angles({2: (0.5, 0.5)}, (100, 100)) == {2: 0.0}


def test_trilinear_resample_matches_scipy_map_coordinates():
    from scipy.ndimage import map_coordinates

    vol = RNG.rand(10, 16, 12).astype(np.float32)
    spacing = (2.0, 1.0, 0.5)
    out, new_sp = resample_to_isotropic(vol, spacing, (1.0, 1.0, 1.0))
    assert new_sp == (1.0, 1.0, 1.0)
    assert out.shape == (20, 16, 6)

    # Golden: corner-aligned index scaling, linear interp, clamped edges.
    zs = np.arange(20) * (1.0 / 2.0)
    ys = np.arange(16) * 1.0
    xs = np.arange(6) * (1.0 / 0.5)
    grid = np.meshgrid(zs, ys, xs, indexing="ij")
    coords = np.stack([g.ravel() for g in grid])
    ref = map_coordinates(vol, coords, order=1, mode="nearest").reshape(20, 16, 6)
    assert np.abs(np.asarray(out) - ref).max() < 1e-4
