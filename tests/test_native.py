"""Native host-ops library: build, parity with numpy fallback, wiring."""

import numpy as np
import pytest

from spine_vision_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    return native.is_available()


def test_build_and_load(lib_available):
    assert lib_available, "native host-ops should build in this environment"


def test_resize_matches_fallback(lib_available):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (3, 37, 53), dtype=np.uint8).astype(np.uint8)
    fast = native.resize_bilinear_u8(images, 24, 48)
    slow = native._resize_fallback(images, 24, 48)
    assert fast.shape == (3, 24, 48)
    # Rounding may differ by 1 LSB between paths.
    assert np.max(np.abs(fast.astype(int) - slow.astype(int))) <= 1


def test_resize_2d_input(lib_available):
    image = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = native.resize_bilinear_u8(image, 4, 4)
    assert out.shape == (4, 4)


def test_normalize_minmax(lib_available):
    arr = np.linspace(-5.0, 10.0, 100, dtype=np.float32).reshape(10, 10)
    out = native.normalize_minmax_u8(arr)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # Constant arrays map to zeros (reference normalize_to_uint8 contract).
    assert native.normalize_minmax_u8(np.full((4, 4), 7.0)).max() == 0


def test_assemble_t2t1t2(lib_available):
    rng = np.random.default_rng(1)
    t1 = rng.integers(0, 256, (2, 5, 6), dtype=np.uint8).astype(np.uint8)
    t2 = rng.integers(0, 256, (2, 5, 6), dtype=np.uint8).astype(np.uint8)
    out = native.assemble_t2t1t2(t1, t2)
    assert out.shape == (2, 5, 6, 3)
    np.testing.assert_array_equal(out[..., 0], t2)
    np.testing.assert_array_equal(out[..., 1], t1)
    np.testing.assert_array_equal(out[..., 2], t2)
    # Single-modality triplication
    only_t2 = native.assemble_t2t1t2(None, t2)
    np.testing.assert_array_equal(only_t2[..., 1], t2)
