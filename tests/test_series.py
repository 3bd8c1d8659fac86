"""Fast middle-slice extraction must equal the naive full-volume path."""

from dataclasses import replace

import numpy as np
import pytest

from spine_vision_tpu.io.series import extract_isotropic_middle_slice
from spine_vision_tpu.io.types import MedicalImage
from spine_vision_tpu.ops import resample_to_isotropic


def _naive(image: MedicalImage, iso: float):
    resampled, new_zyx = resample_to_isotropic(
        image.array, image.spacing_zyx, (iso, iso, iso)
    )
    iso_image = replace(
        image,
        array=np.asarray(resampled),
        spacing=(new_zyx[2], new_zyx[1], new_zyx[0]),
        metadata=dict(image.metadata),
    )
    return iso_image.extract_middle_slice(), iso_image.slice_spacing()


_DIRECTIONS = [
    np.eye(3),
    # x flipped (RPI-ish)
    np.diag([-1.0, 1.0, 1.0]),
    # in-plane flips
    np.diag([1.0, -1.0, -1.0]),
    # axis permutation: index axes (x,y,z) point along (P, S, L)
    np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
]


@pytest.mark.parametrize("direction_idx", range(len(_DIRECTIONS)))
def test_fast_middle_slice_matches_naive(direction_idx):
    rng = np.random.default_rng(direction_idx)
    volume = rng.normal(100, 30, (7, 24, 20)).astype(np.float32)
    image = MedicalImage(
        array=volume,
        spacing=(0.7, 0.9, 3.1),
        direction=_DIRECTIONS[direction_idx],
    )
    want, want_spacing = _naive(image, iso=0.5)
    got, got_spacing = extract_isotropic_middle_slice(image, iso=0.5)
    assert got_spacing == pytest.approx(want_spacing)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-2)


def test_fast_middle_slice_2d_resamples_in_plane():
    # 2D inputs are resampled to isotropic pixels too (reference applies the
    # full isotropic resample to them): rows 10 * 0.8/0.3, cols 12 * 0.5/0.3.
    image = MedicalImage(
        array=np.ones((10, 12), dtype=np.float32), spacing=(0.5, 0.8)
    )
    got, spacing = extract_isotropic_middle_slice(image)
    assert got.shape == (27, 20)
    assert spacing == (0.3, 0.3)
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_study_input_from_paths(tmp_path):
    from spine_vision_tpu.infer import study_input_from_paths
    from spine_vision_tpu.io import write_medical_image

    rng = np.random.default_rng(3)
    for s in ("t1", "t2"):
        vol = rng.normal(100, 30, (6, 40, 32)).astype(np.float32)
        write_medical_image(
            MedicalImage(array=vol, spacing=(1.0, 1.0, 3.0)),
            tmp_path / f"series_{s}.mha",
        )
    study = study_input_from_paths(
        tmp_path / "series_t1.mha", tmp_path / "series_t2.mha"
    )
    assert study.study_id == "series_t2"
    assert study.t1_slice.ndim == 2 and study.t1_slice.dtype == np.float32
    assert study.t1_spacing == (0.3, 0.3)
    # Isotropic sizes: rows = 6 slices * 3.0 mm / 0.3 = 60, cols = 40 / 0.3.
    assert study.t1_slice.shape == (60, 133)


def _signed_permutations():
    from itertools import permutations, product

    for perm in permutations(range(3)):
        for signs in product((1.0, -1.0), repeat=3):
            m = np.zeros((3, 3))
            for col, (row, s) in enumerate(zip(perm, signs)):
                m[row, col] = s
            yield m


@pytest.mark.parametrize("case", range(48))
def test_fast_middle_slice_all_48_orientations(case):
    """Every signed-permutation direction matrix (all axis-aligned
    orientations incl. combined permutation+flip, which the small
    _DIRECTIONS set misses) must match the naive resample+orient+slice."""
    direction = list(_signed_permutations())[case]
    rng = np.random.default_rng(case)
    volume = rng.normal(100, 30, (6, 18, 14)).astype(np.float32)
    image = MedicalImage(
        array=volume, spacing=(0.8, 1.1, 2.7), direction=direction
    )
    want, want_spacing = _naive(image, iso=0.6)
    got, got_spacing = extract_isotropic_middle_slice(image, iso=0.6)
    assert got_spacing == pytest.approx(want_spacing)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-2)
