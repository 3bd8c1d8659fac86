"""Synthetic OCR data generation + training utilities (train.ocr, synth)."""

import numpy as np
import pytest

from spine_vision_tpu.data.phenikaa import synth
from spine_vision_tpu.models.textrec import VIETNAMESE_CHARSET
from spine_vision_tpu.train.ocr import (
    character_error_rate,
    load_variables_npz,
    save_variables_npz,
)


def test_fonts_cover_vietnamese_charset():
    """DejaVu must render a glyph for every recognizer charset character."""
    from PIL import ImageFont

    assert synth.FONT_PATHS, "no fonts found"
    font = ImageFont.truetype(synth.FONT_PATHS[0], 24)
    missing = [
        c
        for c in VIETNAMESE_CHARSET
        if c != " " and font.getmask(c).getbbox() is None
    ]
    assert not missing, missing


def test_recognition_batch_shapes_and_encoding():
    rng = np.random.default_rng(0)
    images, ids, pad, texts = synth.recognition_batch(rng, 6, max_len=40)
    assert images.shape == (6, 32, 256)
    assert ids.shape == (6, 40) and pad.shape == (6, 40)
    assert 0.0 <= images.min() and images.max() <= 255.0
    for row_ids, row_pad, text in zip(ids, pad, texts):
        n = int((row_pad == 0).sum())
        decoded = "".join(
            VIETNAMESE_CHARSET[i - 1] for i in row_ids[:n]
        )
        kept = "".join(c for c in text if c in VIETNAMESE_CHARSET)[:40]
        assert decoded == kept


def test_detection_page_and_target():
    rng = np.random.default_rng(1)
    page, boxes, texts = synth.detection_page(rng, (320, 448))
    assert page.shape == (320, 448)
    assert boxes.shape[1] == 4 and len(texts) == len(boxes)
    target = synth.detection_target(boxes, (320, 448))
    assert target.shape == (160, 224)
    assert 0 < target.mean() < 0.5  # sparse text kernels
    # Kernel pixels must lie inside their (scaled) boxes.
    ys, xs = np.nonzero(target)
    inside = np.zeros(len(ys), bool)
    for x1, y1, x2, y2 in boxes / 2.0:
        inside |= (xs >= x1 - 1) & (xs <= x2 + 1) & (ys >= y1 - 1) & (ys <= y2 + 1)
    assert inside.all()


def test_character_error_rate():
    assert character_error_rate(["abc"], ["abc"]) == 0.0
    assert character_error_rate(["abd"], ["abc"]) == pytest.approx(1 / 3)
    assert character_error_rate([""], ["ab"]) == 1.0
    assert character_error_rate(["ab", "x"], ["ab", "xy"]) == pytest.approx(1 / 4)


def test_variables_npz_roundtrip(tmp_path):
    variables = {
        "params": {"layer": {"kernel": np.ones((3, 4), np.float32) * 0.5}},
        "batch_stats": {"bn": {"mean": np.arange(4, dtype=np.float32)}},
    }
    path = tmp_path / "w.npz"
    save_variables_npz(variables, path)
    back = load_variables_npz(path)
    np.testing.assert_allclose(
        back["params"]["layer"]["kernel"], 0.5, atol=1e-3
    )
    np.testing.assert_array_equal(
        back["batch_stats"]["bn"]["mean"], np.arange(4, dtype=np.float32)
    )
    assert back["params"]["layer"]["kernel"].dtype == np.float32


def test_report_page_contains_fields():
    rng = np.random.default_rng(2)
    page = synth.render_report_page("Nguyễn Văn An", "01/02/1980", "123456", rng)
    assert page.ndim == 2 and page.min() < 60 and page.max() > 200
