"""Corruption-robustness fuzz for the hand-written IO decoders.

The reference delegates decoding to GDCM/SimpleITK, which are hardened by
decades of fuzzing (io/readers.py:52-161); these from-scratch decoders must
hold the same line: a corrupted stream may fail with a clean ValueError-family
error (or succeed, when the flipped bytes land in don't-care regions), but
must never hang, crash the process, or raise unrelated internal errors.
Each case is bounded by a wall-clock alarm so an accidental O(garbage) loop
fails the test instead of wedging the suite.
"""

from __future__ import annotations

import signal
import struct
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import pytest

from spine_vision_tpu.io.jpeg_lossless import (
    JpegLosslessError,
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)
from spine_vision_tpu.io.types import MedicalImage
from spine_vision_tpu.io.writers import write_medical_image

# Decoders may legitimately surface corruption as any ValueError subclass
# (JpegLosslessError is one) or a struct/key/index error from a truncated
# header — but NOT TypeError/AttributeError/RecursionError etc.
_CLEAN_ERRORS = (ValueError, KeyError, IndexError, struct.error, EOFError, OSError)
assert issubclass(JpegLosslessError, ValueError)  # the claim above, enforced


@contextmanager
def _deadline(seconds: int = 20):
    def _raise(signum, frame):  # pragma: no cover - only on hang
        raise TimeoutError("decoder exceeded fuzz deadline")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _flip_bytes(data: bytes, rng: np.random.Generator, n_flips: int) -> bytes:
    buf = bytearray(data)
    for _ in range(n_flips):
        i = int(rng.integers(0, len(buf)))
        buf[i] ^= int(rng.integers(1, 256))
    return bytes(buf)


def test_jpeg_lossless_fuzz_corrupt_bytes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    blob = encode_jpeg_lossless(img)
    for trial in range(60):
        bad = _flip_bytes(blob, rng, n_flips=1 + trial % 4)
        with _deadline():
            try:
                out = decode_jpeg_lossless(bad)
                assert out.shape == (32, 32)  # success must keep the contract
            except _CLEAN_ERRORS:
                pass


def test_jpeg_lossless_fuzz_truncation():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, size=(16, 24)).astype(np.uint16)
    blob = encode_jpeg_lossless(img)
    for cut in range(2, len(blob), max(1, len(blob) // 40)):
        with _deadline():
            try:
                decode_jpeg_lossless(blob[:cut])
            except _CLEAN_ERRORS:
                pass


def test_dicom_fuzz_corrupt_bytes(tmp_path: Path):
    from spine_vision_tpu.io.readers import read_dicom_file

    rng = np.random.default_rng(2)
    img = MedicalImage(
        array=rng.integers(0, 4096, size=(1, 24, 24)).astype(np.int16),
        spacing=(0.7, 0.7, 3.0),
    )
    path = tmp_path / "slice.dcm"
    write_medical_image(img, path)
    blob = path.read_bytes()
    roundtrip = read_dicom_file(path)
    assert roundtrip.array.shape == (1, 24, 24)

    bad_path = tmp_path / "bad.dcm"
    for trial in range(60):
        bad_path.write_bytes(_flip_bytes(blob, rng, n_flips=1 + trial % 8))
        with _deadline():
            try:
                out = read_dicom_file(bad_path)
                assert out.array.ndim == 3
            except _CLEAN_ERRORS:
                pass


def test_dicom_fuzz_truncation(tmp_path: Path):
    from spine_vision_tpu.io.readers import read_dicom_file

    rng = np.random.default_rng(3)
    img = MedicalImage(
        array=rng.integers(0, 4096, size=(1, 16, 16)).astype(np.int16),
        spacing=(1.0, 1.0, 1.0),
    )
    path = tmp_path / "slice.dcm"
    write_medical_image(img, path)
    blob = path.read_bytes()
    bad_path = tmp_path / "cut.dcm"
    for cut in range(8, len(blob), max(1, len(blob) // 40)):
        bad_path.write_bytes(blob[:cut])
        with _deadline():
            try:
                read_dicom_file(bad_path)
            except _CLEAN_ERRORS:
                pass


def test_nifti_fuzz_corrupt_bytes(tmp_path: Path):
    from spine_vision_tpu.io.readers import read_nifti

    rng = np.random.default_rng(4)
    img = MedicalImage(
        array=rng.normal(size=(4, 12, 12)).astype(np.float32),
        spacing=(1.0, 1.0, 2.0),
    )
    path = tmp_path / "vol.nii"
    write_medical_image(img, path, use_compression=False)
    blob = path.read_bytes()
    bad_path = tmp_path / "bad.nii"
    for trial in range(40):
        bad_path.write_bytes(_flip_bytes(blob, rng, n_flips=1 + trial % 4))
        with _deadline():
            try:
                out = read_nifti(bad_path)
                assert out.array.ndim >= 2
            except _CLEAN_ERRORS:
                pass


@pytest.mark.parametrize("ext", ["mha", "nrrd"])
def test_mha_nrrd_fuzz_corrupt_bytes(tmp_path: Path, ext: str):
    from spine_vision_tpu.io.readers import read_medical_image

    rng = np.random.default_rng(5)
    img = MedicalImage(
        array=rng.integers(0, 1000, size=(3, 10, 10)).astype(np.int16),
        spacing=(1.0, 1.0, 2.0),
    )
    path = tmp_path / f"vol.{ext}"
    write_medical_image(img, path, use_compression=False)
    blob = path.read_bytes()
    bad_path = tmp_path / f"bad.{ext}"
    for trial in range(40):
        bad_path.write_bytes(_flip_bytes(blob, rng, n_flips=1 + trial % 4))
        with _deadline():
            try:
                out = read_medical_image(bad_path)
                assert out.array.ndim >= 2
            except _CLEAN_ERRORS:
                pass
    for cut in range(4, len(blob), max(1, len(blob) // 25)):
        bad_path.write_bytes(blob[:cut])
        with _deadline():
            try:
                read_medical_image(bad_path)
            except _CLEAN_ERRORS:
                pass
