"""Phenikaa preprocessing: matching goldens, OCR stack shapes, E2E with fakes."""

import csv
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from spine_vision_tpu.data.phenikaa import (
    PreprocessConfig,
    build_report_processor_registry,
    preprocess_phenikaa,
)
from spine_vision_tpu.data.phenikaa.matching import (
    ascii_fold,
    build_folder_lookup,
    find_matching_folder,
    fuzzy_match_score,
    fuzzy_value_extract,
    parse_image_folder_name,
)
from spine_vision_tpu.data.phenikaa.ocr import DocumentExtractor
from spine_vision_tpu.models.textdet import (
    TextDetectionNet,
    extract_boxes_from_probmap,
)
from spine_vision_tpu.models.textrec import (
    BLANK_ID,
    TextRecognitionNet,
    VIETNAMESE_CHARSET,
    charset_size,
    ctc_greedy_decode,
)
from spine_vision_tpu.ops.warp import rectify_polygons


# ---------------------------------------------------------------------------
# Matching
# ---------------------------------------------------------------------------


def test_ascii_fold_vietnamese():
    assert ascii_fold("Nguyễn Văn Đức") == "Nguyen Van Duc"
    assert ascii_fold("Hồ tên người bệnh") == "Ho ten nguoi benh"


def test_fuzzy_match_score_diacritics():
    assert fuzzy_match_score("Nguyễn Văn A", "NGUYEN VAN A") == 100.0


def test_fuzzy_value_extract():
    lines = [
        "BENH VIEN PHENIKAA",
        "Ho ten nguoi benh: Nguyen Van Binh",
        "Ngay sinh: 02/03/1985",
        "So phieu: 250012345",
    ]
    assert fuzzy_value_extract(lines, "Ho ten nguoi benh", 80, 3) == "NGUYENVANBINH"
    assert fuzzy_value_extract(lines, "Ngay sinh", 80, 2) == "02/03/1985"
    assert fuzzy_value_extract(lines, "So phieu", 80, 2) == "250012345"
    assert fuzzy_value_extract(lines, "Khong ton tai", 80, 2) is None


def _quad(x1, y1, x2, y2):
    return np.array(
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float32
    )


def test_fuzzy_value_extract_spatial_label_below_and_beside():
    from spine_vision_tpu.data.phenikaa.matching import (
        fuzzy_value_extract_spatial,
    )

    lines = [
        ("BENH VIEN PHENIKAA", _quad(20, 10, 300, 30)),
        # Boxed report number: label on its own line, value below it.
        ("So phieu:", _quad(400, 10, 500, 30)),
        ("250012345", _quad(405, 40, 520, 65)),
        # Two-column pair: label left, value in a separate right-column box.
        ("Ngay sinh", _quad(20, 100, 120, 125)),
        ("02/03/1985", _quad(160, 102, 280, 126)),
        # Same-line pair must keep taking the same-line split.
        ("Ho ten nguoi benh: Nguyen Van Binh", _quad(20, 150, 420, 175)),
    ]
    assert (
        fuzzy_value_extract_spatial(lines, "So phieu", 80, 2) == "250012345"
    )
    assert (
        fuzzy_value_extract_spatial(lines, "Ngay sinh", 80, 2) == "02/03/1985"
    )
    assert (
        fuzzy_value_extract_spatial(lines, "Ho ten nguoi benh", 80, 3)
        == "NGUYENVANBINH"
    )
    assert fuzzy_value_extract_spatial(lines, "Khong ton tai", 80, 2) is None


def test_fuzzy_value_extract_spatial_prefers_nearest_candidate():
    from spine_vision_tpu.data.phenikaa.matching import (
        fuzzy_value_extract_spatial,
    )

    lines = [
        ("So phieu:", _quad(100, 10, 200, 30)),
        ("250099999", _quad(100, 120, 220, 145)),  # farther below
        ("250012345", _quad(105, 40, 225, 65)),  # directly under the label
    ]
    assert (
        fuzzy_value_extract_spatial(lines, "So phieu", 80, 2) == "250012345"
    )


def test_parse_image_folder_name():
    assert parse_image_folder_name("NGUYEN_VAN_A_1980_20240101") == (
        "NGUYENVANA",
        "1980",
    )
    assert parse_image_folder_name("TRAN_THI_B_20240202") == ("TRANTHIB", None)
    assert parse_image_folder_name("LE_VAN_C_1975_20240303 (2)") == (
        "LEVANC",
        "1975",
    )


def test_find_matching_folder_birth_year_tiebreak(tmp_path):
    for name in ("NGUYEN_VAN_A_1980_20240101", "NGUYEN_VAN_A_1990_20240102"):
        (tmp_path / name).mkdir()
    folder_map = build_folder_lookup(tmp_path)
    assert len(folder_map) == 2
    match = find_matching_folder("NGUYENVANA", "01/01/1990", folder_map)
    assert match is not None and match.name == "NGUYEN_VAN_A_1990_20240102"


def test_folder_lookup_keeps_colliding_names(tmp_path):
    """Same patient scanned on two dates (or two same-named patients with no
    birth year in the folder name) must BOTH stay indexed; the reference's
    name-keyed dict silently overwrote one (reference matching.py:158-186)."""
    for name in ("TRAN_THI_B_20240101", "TRAN_THI_B_20240601"):
        (tmp_path / name).mkdir()
    folder_map = build_folder_lookup(tmp_path)
    assert len(folder_map) == 2
    # Distinct-name folders in different parents must also both survive.
    (tmp_path / "siteA").mkdir()
    (tmp_path / "siteA" / "LE_VAN_C_20240201").mkdir()
    (tmp_path / "siteB").mkdir()
    (tmp_path / "siteB" / "LE_VAN_C_20240201").mkdir()
    folder_map = build_folder_lookup(tmp_path)
    assert len(folder_map) == 4


# ---------------------------------------------------------------------------
# OCR stack
# ---------------------------------------------------------------------------


def test_textdet_shapes():
    model = TextDetectionNet(width=8, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    prob = model.apply(variables, x, train=False)
    assert prob.shape == (1, 32, 48, 1)
    assert float(prob.min()) >= 0.0 and float(prob.max()) <= 1.0


def test_extract_boxes_from_probmap():
    prob = np.zeros((32, 48), dtype=np.float32)
    prob[10:14, 5:25] = 0.9  # one text kernel
    prob[20:23, 30:40] = 0.9  # another, lower on the page
    quads = extract_boxes_from_probmap(prob, threshold=0.5, min_area=8, scale=2.0)
    assert quads.shape == (2, 4, 2)
    # Reading order: first quad is the upper one; scale doubles coordinates.
    assert quads[0][0][1] < quads[1][0][1]
    assert quads[0][2][0] > 2 * 24  # unclipped beyond the raw extent


def test_rectify_polygons_identity():
    rng = np.random.default_rng(0)
    image = rng.uniform(0, 255, (40, 60)).astype(np.float32)
    # Axis-aligned quad == plain crop (no resize: quad size == out size).
    quad = np.array([[10.0, 5.0], [29.0, 5.0], [29.0, 24.0], [10.0, 24.0]])
    out = np.asarray(
        rectify_polygons(jnp.asarray(image), jnp.asarray(quad)[None], 20, 20)
    )[0]
    np.testing.assert_allclose(out, image[5:25, 10:30], rtol=1e-4, atol=1e-2)


def test_rectify_polygons_page_bounds_match_per_page():
    """The batched multi-page rectification (pages stacked into one tall
    image; page-local quads + per-quad bounds/offsets,
    data/phenikaa/ocr.py round 5) must match per-page rectify_polygons to
    float-rounding accuracy — including quads hanging past their page
    edge, which must replicate THAT page's border instead of bleeding into
    the neighbor page. The homography is solved in LOCAL coordinates and
    the page offset is added after the clamp: baking a large y-offset into
    the corners degrades the f32 8x8 solve's conditioning (measured 252
    gray levels of error at 16 pages on TPU); post-solve offsets leave
    only bilinear-fraction rounding (< 0.01 gray levels)."""
    rng = np.random.default_rng(1)
    pages = [
        rng.uniform(0, 255, (40, 60)).astype(np.float32),
        rng.uniform(0, 255, (30, 50)).astype(np.float32),  # smaller page
    ]
    quads = [
        # hangs past the bottom edge of page 0 (y up to 45 > 39)
        np.array([[5.0, 30.0], [40.0, 30.0], [40.0, 45.0], [5.0, 45.0]]),
        # hangs past the right edge of page 1 (x up to 55 > 49)
        np.array([[20.0, 5.0], [55.0, 5.0], [55.0, 20.0], [20.0, 20.0]]),
    ]
    per_page = [
        np.asarray(
            rectify_polygons(jnp.asarray(p), jnp.asarray(q)[None], 16, 48)
        )[0]
        for p, q in zip(pages, quads)
    ]

    hmax, wmax = 40, 60
    stacked = np.zeros((2, hmax, wmax), np.float32)
    for i, p in enumerate(pages):
        stacked[i, : p.shape[0], : p.shape[1]] = p
    all_quads = np.stack(quads).astype(np.float32)  # page-LOCAL coords
    bounds = np.array([[39.0, 59.0], [29.0, 49.0]], np.float32)
    offsets = np.array([[0.0, 0.0], [float(hmax), 0.0]], np.float32)
    batched = np.asarray(
        rectify_polygons(
            jnp.asarray(stacked.reshape(-1, wmax)),
            jnp.asarray(all_quads),
            16,
            48,
            bounds=jnp.asarray(bounds),
            offsets=jnp.asarray(offsets),
        )
    )
    np.testing.assert_allclose(batched[0], per_page[0], atol=0.05)
    np.testing.assert_allclose(batched[1], per_page[1], atol=0.05)


def test_ctc_greedy_decode():
    t, c = 8, charset_size()
    logits = np.full((1, t, c), -10.0, dtype=np.float32)
    # "ab" with repeats and blanks: a a _ b b _ _ _
    a = VIETNAMESE_CHARSET.index("a") + 1
    b = VIETNAMESE_CHARSET.index("b") + 1
    for step, token in enumerate([a, a, BLANK_ID, b, b, BLANK_ID, BLANK_ID, BLANK_ID]):
        logits[0, step, token] = 10.0
    assert ctc_greedy_decode(logits) == ["ab"]


def test_textrec_shapes():
    model = TextRecognitionNet(width=16, num_layers=1, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 16, charset_size())


# ---------------------------------------------------------------------------
# End-to-end with fake OCR engine
# ---------------------------------------------------------------------------


class _FakeDetector:
    def detect(self, image):
        h, w = np.asarray(image).shape[:2]
        return np.array(
            [[[2.0, 2.0], [w - 2.0, 2.0], [w - 2.0, 12.0], [2.0, 12.0]]],
            dtype=np.float32,
        )


class _FakeRecognizer:
    def __init__(self, lines):
        self.lines = lines

    def recognize_batch(self, patches):
        return self.lines[: len(patches)]


class _FakeExtractor(DocumentExtractor):
    """Real composition class, canned text output per report stem."""

    def __init__(self, per_report: dict[str, list[str]]):
        self.per_report = per_report

    def extract(self, path: Path) -> list[str]:
        return self.per_report.get(Path(path).stem, [])

    def extract_lines(self, path: Path) -> list[tuple[str, np.ndarray]]:
        # Canned lines stacked vertically: line i occupies rows [40i, 40i+30).
        return [
            (
                text,
                np.array(
                    [[10, 40 * i], [400, 40 * i], [400, 40 * i + 30], [10, 40 * i + 30]],
                    dtype=np.float32,
                ),
            )
            for i, text in enumerate(self.extract(path))
        ]

    def extract_from_pdf_crop(self, path, crop_region, dpi=200):
        return []


def test_preprocess_phenikaa_end_to_end(tmp_path):
    data = tmp_path / "raw"
    images = data / "images"
    tables = data / "labels" / "tables"
    reports = data / "labels" / "reports"
    for d in (images, tables, reports):
        d.mkdir(parents=True)

    # Two study folders; report matches patient A by name+birth year.
    (images / "NGUYEN_VAN_A_1980_20240101").mkdir()
    (images / "NGUYEN_VAN_A_1980_20240101" / "dummy.txt").write_text("x")
    (images / "TRAN_THI_B_1990_20240105").mkdir()

    # Label table: patient 250012345 with 2 levels; Modic one-hot expansion.
    with open(tables / "labels.csv", "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["Patient ID", "IVD label", "Pfirrman grade", "Modic"]
        )
        writer.writeheader()
        writer.writerow(
            {"Patient ID": 250012345, "IVD label": 1, "Pfirrman grade": 2, "Modic": 0}
        )
        writer.writerow(
            {"Patient ID": 250012345, "IVD label": 2, "Pfirrman grade": 3, "Modic": 1}
        )
        writer.writerow(
            {"Patient ID": 999999999, "IVD label": 1, "Pfirrman grade": 1, "Modic": 0}
        )

    # ID-named report (PNG).
    Image.fromarray(np.zeros((32, 64), dtype=np.uint8)).save(
        reports / "250012345.png"
    )

    extractor = _FakeExtractor(
        {
            "250012345": [
                "Ho ten nguoi benh: Nguyen Van A",
                "Ngay sinh: 15/05/1980",
            ]
        }
    )
    config = PreprocessConfig(
        data_path=data, output_path=tmp_path / "interim"
    )
    result = preprocess_phenikaa(config, extractor=extractor)

    assert result.num_samples == 1
    copied = tmp_path / "interim" / "images" / "250012345"
    assert (copied / "dummy.txt").exists()
    out_table = tmp_path / "interim" / "radiological_labels.csv"
    with open(out_table, newline="") as f:
        rows = list(csv.DictReader(f))
    # Only the matched patient's rows survive; Modic one-hot expanded.
    assert len(rows) == 2
    assert all(r["Patient ID"] == "250012345" for r in rows)
    assert "Modic_0" in rows[0] and "Modic_1" in rows[0]


def test_registry_dispatch(tmp_path):
    registry = build_report_processor_registry()
    id_named = tmp_path / "250012345.png"
    patient_named = tmp_path / "NGUYEN_VAN_SON_20250718.pdf"
    weird = tmp_path / "scan 01-02.tiff"
    for p in (id_named, patient_named, weird):
        p.touch()
    procs = registry._processors
    assert procs[0].can_process(id_named)
    assert not procs[0].can_process(patient_named)
    assert procs[1].can_process(patient_named)
    assert not procs[1].can_process(weird)


def test_find_matching_folder_folds_diacritics(tmp_path):
    """Filename-derived names keep diacritics; folder names are uppercase
    ASCII — matching must fold both sides (regression)."""
    (tmp_path / "BUI_THI_DUNG_1985_20240101").mkdir()
    folder_map = build_folder_lookup(tmp_path)
    match = find_matching_folder("BùiThịDung", "02/03/1985", folder_map)
    assert match is not None and match.name == "BUI_THI_DUNG_1985_20240101"


def test_id_from_text_prefers_contiguous_run():
    """OCR ID extraction: a date on the same line must not corrupt the ID
    (the reference concatenates every digit on the line)."""
    from spine_vision_tpu.data.phenikaa import _id_from_text

    assert _id_from_text("So phieu: 250099999 Ngay 15/05/2024") == 250099999
    assert _id_from_text("250012345") == 250012345
    # OCR-split ID with no 6-digit run falls back to concatenation.
    assert _id_from_text("2500 99999") == 250099999
    # Pure date fragments never qualify.
    assert _id_from_text("15/05/2024") is None
    assert _id_from_text("no digits here") is None


def test_parse_filename_space_separated_date():
    from spine_vision_tpu.data.phenikaa import PatientNamedReportProcessor

    parse = PatientNamedReportProcessor._parse_filename
    assert parse("NGUYEN_VAN_SON_20250718") == ("NGUYENVANSON", "20250718")
    assert parse("Nguyen Van A 19800515") == ("NguyenVanA", "19800515")
    assert parse("NGUYEN_VAN_SON") == ("NGUYENVANSON", None)


def test_collect_report_files_case_insensitive(tmp_path):
    from spine_vision_tpu.data.phenikaa import collect_report_files

    (tmp_path / "a.pdf").write_bytes(b"x")
    (tmp_path / "b.PDF").write_bytes(b"x")
    (tmp_path / "c.JPG").write_bytes(b"x")
    (tmp_path / "d.txt").write_bytes(b"x")
    names = {p.name for p in collect_report_files(tmp_path)}
    assert names == {"a.pdf", "b.PDF", "c.JPG"}
