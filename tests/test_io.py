"""Host I/O: DICOM decode regressions, format round trips, NRRD parsing."""

import struct

import numpy as np
import pytest

from spine_vision_tpu.io import (
    read_medical_image,
    write_medical_image,
)
from spine_vision_tpu.io.dicom import DicomFile, _decode_int, read_dicom_series
from spine_vision_tpu.io.nrrd import read_nrrd
from spine_vision_tpu.io.types import MedicalImage


# ---------------------------------------------------------------------------
# DICOM value decoding
# ---------------------------------------------------------------------------


def test_decode_int_is_ascii():
    """IS values are ASCII even at 2 bytes (regression: b'1 ' read as
    binary uint16 8241 scrambled slice ordering and NumberOfFrames)."""
    assert _decode_int(b"1 ") == 1
    assert _decode_int(b"15") == 15
    assert _decode_int(b"7") == 7
    assert _decode_int(b"100 ") == 100
    assert _decode_int(b"-3 ") == -3
    # Binary fallback only for non-ASCII payloads.
    assert _decode_int(struct.pack("<H", 513)) == 513
    assert _decode_int(b"", default=42) == 42


# ---------------------------------------------------------------------------
# Minimal explicit-VR DICOM synthesis -> parse
# ---------------------------------------------------------------------------


def _element(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _write_minimal_dicom(path, instance_number: bytes, pixel_value: int = 7):
    ts = b"1.2.840.10008.1.2.1\x00"  # explicit VR little endian
    meta = _element(0x0002, 0x0010, b"UI", ts)
    rows, cols = 4, 6
    pixels = np.full((rows, cols), pixel_value, dtype=np.uint16).tobytes()
    body = b"".join(
        [
            _element(0x0008, 0x0060, b"CS", b"MR"),
            _element(0x0020, 0x000E, b"UI", b"1.2.3\x00"),
            _element(0x0020, 0x0013, b"IS", instance_number),
            _element(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _element(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _element(0x0028, 0x0030, b"DS", b"0.5\\0.5 "),
            _element(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _element(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _element(0x7FE0, 0x0010, b"OW", pixels),
        ]
    )
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)


def test_minimal_dicom_parse_and_instance_sort(tmp_path):
    # Instance numbers 1..3 as 1-2 char IS strings must sort numerically.
    for i, token in enumerate((b"2 ", b"10", b"1 ")):
        _write_minimal_dicom(tmp_path / f"s{i}.dcm", token, pixel_value=i + 1)
    single = DicomFile(tmp_path / "s0.dcm")
    assert single.instance_number == 2
    assert single.rows == 4 and single.cols == 6
    assert single.pixel_array().shape == (4, 6)

    volume = read_dicom_series(tmp_path)
    assert volume.array.shape == (3, 4, 6)
    # Sorted by instance number: files with pixel values 3 (inst 1),
    # 1 (inst 2), 2 (inst 10).
    assert [int(volume.array[k, 0, 0]) for k in range(3)] == [3, 1, 2]


# ---------------------------------------------------------------------------
# Format round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("suffix", [".mha", ".nrrd", ".nii.gz"])
def test_write_read_roundtrip(tmp_path, suffix):
    rng = np.random.default_rng(0)
    volume = rng.normal(0, 100, (5, 8, 6)).astype(np.float32)
    image = MedicalImage(
        array=volume, spacing=(0.7, 0.9, 2.5), origin=(1.0, -2.0, 3.0)
    )
    path = tmp_path / f"vol{suffix}"
    write_medical_image(image, path)
    back = read_medical_image(path)
    np.testing.assert_allclose(back.array, volume, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, image.spacing, rtol=1e-5)


def test_nifti_zero_slope_disables_scaling(tmp_path):
    """scl_slope == 0 means 'no scaling' per the NIfTI-1 spec: the intercept
    must be ignored too (ITK MustRescale / nibabel agree), not applied with
    an implied slope of 1."""
    volume = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    image = MedicalImage(array=volume, spacing=(1.0, 1.0, 1.0))
    path = tmp_path / "vol.nii"
    write_medical_image(image, path)
    raw = bytearray(path.read_bytes())
    import struct

    struct.pack_into("<f", raw, 112, 0.0)  # scl_slope = 0
    struct.pack_into("<f", raw, 116, 100.0)  # scl_inter (must be ignored)
    path.write_bytes(bytes(raw))
    back = read_medical_image(path)
    np.testing.assert_array_equal(back.array, volume)
    assert back.array.dtype == np.int16


def test_dicom_series_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    volume = rng.integers(-500, 3000, (4, 16, 12)).astype(np.int16)
    image = MedicalImage(
        array=volume, spacing=(0.6, 0.8, 3.0), origin=(5.0, -7.0, 2.0)
    )
    out = tmp_path / "series"
    write_medical_image(image, out)
    assert len(list(out.glob("*.dcm"))) == 4
    back = read_medical_image(out)
    np.testing.assert_array_equal(back.array, volume)
    np.testing.assert_allclose(back.spacing, image.spacing, rtol=1e-5)
    np.testing.assert_allclose(back.origin, image.origin, atol=1e-5)


def test_dicom_single_file_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    plane = rng.integers(0, 4000, (1, 10, 14)).astype(np.uint16)
    image = MedicalImage(array=plane, spacing=(0.5, 0.5, 1.0))
    path = tmp_path / "slice.dcm"
    write_medical_image(image, path)
    back = read_medical_image(path)
    np.testing.assert_array_equal(np.squeeze(back.array), plane[0])


def test_dicom_write_rejects_float(tmp_path):
    image = MedicalImage(array=np.zeros((2, 4, 4), dtype=np.float32))
    with pytest.raises(ValueError, match="integer"):
        write_medical_image(image, tmp_path / "series")


def test_nrrd_space_directions_none(tmp_path):
    """Regression: 'none' tokens for non-spatial axes crashed the parser."""
    data = np.arange(2 * 4 * 5, dtype=np.float32).reshape(5, 4, 2)
    header = (
        "NRRD0004\n"
        "dimension: 3\n"
        "sizes: 2 4 5\n"
        "type: float\n"
        "encoding: raw\n"
        "endian: little\n"
        "space: left-posterior-superior\n"
        "space directions: none (1.5,0,0) (0,2.5,0)\n"
        "\n"
    )
    path = tmp_path / "seg.nrrd"
    path.write_bytes(header.encode() + data.tobytes())
    image = read_nrrd(path)
    assert image.array.shape == (5, 4, 2)
    assert image.spacing[0] == pytest.approx(1.5)
    assert image.spacing[1] == pytest.approx(2.5)


# ---------------------------------------------------------------------------
# Round-3 review regressions: series selection, MONOCHROME1, UN skip, raw VR
# ---------------------------------------------------------------------------


def _write_dicom_with(path, extra_body=b"", series_uid=b"1.2.3\x00",
                      photometric=None, instance=b"1 ", value=7,
                      include_pixels=True, include_uid=True):
    ts = b"1.2.840.10008.1.2.1\x00"
    meta = _element(0x0002, 0x0010, b"UI", ts)
    rows, cols = 4, 6
    parts = [_element(0x0008, 0x0060, b"CS", b"MR")]
    if include_uid:
        parts.append(_element(0x0020, 0x000E, b"UI", series_uid))
    parts.append(_element(0x0020, 0x0013, b"IS", instance))
    parts += [
        _element(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _element(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _element(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _element(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
    ]
    if photometric is not None:
        parts.append(_element(0x0028, 0x0004, b"CS", photometric))
    parts.append(extra_body)
    if include_pixels:
        pixels = np.full((rows, cols), value, dtype=np.uint16).tobytes()
        parts.append(_element(0x7FE0, 0x0010, b"OW", pixels))
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + b"".join(parts))


def test_series_skips_empty_uid_group(tmp_path):
    """A DICOMDIR-style file without SeriesInstanceUID (and without pixels)
    groups under "" which sorts first — it must never shadow a real series."""
    _write_dicom_with(tmp_path / "DICOMDIR", include_uid=False,
                      include_pixels=False)
    _write_dicom_with(tmp_path / "a.dcm", value=9)
    volume = read_dicom_series(tmp_path)
    assert volume.array.shape == (1, 4, 6)
    assert int(volume.array[0, 0, 0]) == 9


def test_monochrome1_inversion_is_slice_consistent(tmp_path):
    """MONOCHROME1 inverts against the fixed stored-range maximum, not the
    per-slice data max (which banded identical tissue across slices)."""
    bits_stored_elem = _element(0x0028, 0x0101, b"US", struct.pack("<H", 12))
    _write_dicom_with(tmp_path / "a.dcm", extra_body=bits_stored_elem,
                      photometric=b"MONOCHROME1", value=100)
    arr = DicomFile(tmp_path / "a.dcm").pixel_array()
    assert int(arr[0, 0]) == (2**12 - 1) - 100


def test_undefined_length_un_sequence_parses(tmp_path):
    """Undefined-length UN contents are implicit VR (PS3.5 6.2.2): an
    explicit-VR file with a transcoded private sequence must still parse."""
    # UN, undefined length, one undefined-length item holding one implicit
    # element, then item + sequence delimiters.
    inner = struct.pack("<HHI", 0x0009, 0x0001, 4) + b"ABCD"  # implicit VR
    item = struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF) + inner
    item += struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    seq = (
        struct.pack("<HH", 0x0009, 0x0010) + b"UN" + b"\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF) + item
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    _write_dicom_with(tmp_path / "a.dcm", extra_body=seq, value=5)
    arr = DicomFile(tmp_path / "a.dcm").pixel_array()
    assert int(arr[0, 0]) == 5


def test_raw_explicit_vr_dataset_sniffed(tmp_path):
    """A preamble-less explicit-VR dataset is detected by its first VR."""
    rows, cols = 4, 6
    pixels = np.full((rows, cols), 3, dtype=np.uint16).tobytes()
    body = b"".join(
        [
            _element(0x0008, 0x0060, b"CS", b"MR"),
            _element(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _element(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _element(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _element(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _element(0x7FE0, 0x0010, b"OW", pixels),
        ]
    )
    (tmp_path / "raw.dcm").write_bytes(body)
    f = DicomFile(tmp_path / "raw.dcm")
    assert f.pixel_array().shape == (4, 6)
    assert int(f.pixel_array()[0, 0]) == 3


def test_truncated_pixeldata_is_dicom_error(tmp_path):
    from spine_vision_tpu.io.dicom import DicomError

    rows, cols = 4, 6
    short_pixels = np.full((rows, cols), 7, dtype=np.uint16).tobytes()[:-8]
    body = _element(0x7FE0, 0x0010, b"OW", short_pixels)
    _write_dicom_with(tmp_path / "a.dcm", include_pixels=False,
                      extra_body=body)
    with pytest.raises(DicomError, match="truncated"):
        DicomFile(tmp_path / "a.dcm").pixel_array()
