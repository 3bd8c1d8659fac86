"""Dataset builders: synthetic end-to-end build + resume tests."""

import csv

import numpy as np
import pytest
from PIL import Image

from spine_vision_tpu.data.builders import (
    ClassificationDatasetConfig,
    LocalizationDatasetConfig,
    create_classification_dataset,
    create_localization_dataset,
    parse_image_filename,
    scan_existing_images,
)
from spine_vision_tpu.data.builders.classification import (
    convert_spider_to_phenikaa_level,
)
from spine_vision_tpu.io import write_medical_image
from spine_vision_tpu.io.types import MedicalImage


def test_parse_image_filename():
    info = parse_image_filename("spider_42_sag_t2_L3.png")
    assert info is not None
    assert (info.source, info.patient_id, info.series_type, info.ivd_level) == (
        "spider",
        "42",
        "sag_t2",
        3,
    )
    assert parse_image_filename("other_42_sag_t2_L3.png") is None
    assert parse_image_filename("spider_42_ax_t2_L3.png") is None


def test_spider_level_conversion():
    assert convert_spider_to_phenikaa_level(1) == 5  # L5/S1
    assert convert_spider_to_phenikaa_level(5) == 1  # L1/L2


@pytest.fixture
def spider_tree(tmp_path):
    """Synthetic SPIDER layout: gradings CSV + per-patient .mha volumes."""
    spider = tmp_path / "raw" / "SPIDER"
    (spider / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)

    fieldnames = [
        "Patient", "IVD label", "Pfirrman grade", "Disc herniation",
        "Disc narrowing", "Disc bulging", "Spondylolisthesis", "Modic",
        "UP endplate", "LOW endplate",
    ]
    rows = []
    for pid in (1, 2):
        for spider_level in range(1, 6):
            rows.append({
                "Patient": pid, "IVD label": spider_level,
                "Pfirrman grade": int(rng.integers(1, 6)),
                "Disc herniation": int(rng.integers(0, 2)),
                "Disc narrowing": int(rng.integers(0, 2)),
                "Disc bulging": int(rng.integers(0, 2)),
                "Spondylolisthesis": int(rng.integers(0, 2)),
                "Modic": int(rng.integers(0, 4)),
                "UP endplate": int(rng.integers(0, 2)),
                "LOW endplate": int(rng.integers(0, 2)),
            })
        for suffix in ("t1", "t2"):
            vol = rng.normal(100, 30, (8, 48, 40)).astype(np.float32)
            image = MedicalImage(
                array=vol, spacing=(1.2, 1.0, 4.0), origin=(0, 0, 0)
            )
            write_medical_image(image, spider / "images" / f"{pid}_{suffix}.mha")
    with open(spider / "radiological_gradings.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)
    return tmp_path


def test_classification_build_and_resume(spider_tree):
    config = ClassificationDatasetConfig(
        base_path=spider_tree,
        include_phenikaa=False,
        crop_size=(32, 32),
        image_size=(64, 64),
        padded_hw=(256, 256),
        device_batch_size=2,
    )
    config.output_path.mkdir(parents=True, exist_ok=True)
    result = create_classification_dataset(config)
    # 2 patients x 2 series x 5 levels
    assert result.num_samples == 20
    images = scan_existing_images(config.output_path / "images")
    assert len(images) == 20
    csv_path = config.output_path / "annotations.csv"
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 20
    assert {r["series_type"] for r in rows} == {"sag_t1", "sag_t2"}
    assert {int(r["ivd_level"]) for r in rows} == {1, 2, 3, 4, 5}
    # Crop files decodable and correctly sized
    sample = Image.open(config.output_path / "images" / images[0].filename)
    assert sample.size == (32, 32)

    # Resume: second run recovers everything, processes nothing new.
    result2 = create_classification_dataset(config)
    assert result2.num_samples == 20
    assert "0 new" in result2.summary and "20 recovered" in result2.summary


@pytest.fixture
def lumbar_coords_tree(tmp_path):
    """Synthetic Lumbar Coords pretrain layout: jpg + npy sources."""
    base = tmp_path / "raw" / "Lumbar Coords"
    data = base / "data"
    (data / "processed_spider_jpgs").mkdir(parents=True)
    (data / "processed_lsd").mkdir(parents=True)
    rng = np.random.default_rng(1)

    Image.fromarray(
        rng.integers(0, 255, (64, 64), dtype=np.uint8).astype(np.uint8)
    ).save(data / "processed_spider_jpgs" / "img1.jpg")
    np.save(data / "processed_lsd" / "img2.npy", rng.normal(0, 1, (64, 64)))

    rows = [
        {"filename": "img1.jpg", "source": "spider", "level": "L1/L2",
         "relative_x": 0.5, "relative_y": 0.25},
        {"filename": "img2.jpg", "source": "lsd", "level": "L2/L3",
         "relative_x": 0.4, "relative_y": 0.35},
        {"filename": "img1.jpg", "source": "spider", "level": "L3/L4",
         "relative_x": 0.5, "relative_y": 0.45},
    ]
    with open(base / "coords_pretrain.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return tmp_path


def test_localization_build(lumbar_coords_tree):
    config = LocalizationDatasetConfig(base_path=lumbar_coords_tree)
    config.output_path.mkdir(parents=True, exist_ok=True)
    result = create_localization_dataset(config)
    assert result.num_samples == 3
    images_dir = config.output_path / "images"
    files = sorted(p.name for p in images_dir.iterdir())
    # npy fallback keeps the CSV's .jpg name (reference localization.py:137-141)
    assert files == ["pretrain_lsd_img2.jpg", "pretrain_spider_img1.jpg"]
    with open(config.output_path / "annotations.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[0]["image_path"].startswith("images/")
    # npy source was device-normalized to uint8 before encoding
    arr = np.asarray(Image.open(images_dir / "pretrain_lsd_img2.jpg"))
    assert arr.dtype == np.uint8
    assert arr.max() > 200 and arr.min() < 50  # JPEG-lossy full range


def test_rsna_series_mapping_keeps_duplicate_descriptions(tmp_path):
    """RSNA 2024 studies often repeat a description (two "Sagittal T2/STIR"
    acquisitions); the reference's description-keyed dict shadows one and
    silently drops its coordinate rows (reference rsna.py:26-33) — the
    series_id-keyed mapping must resolve BOTH."""
    from spine_vision_tpu.data.rsna import get_series_type, load_series_mapping

    csv_path = tmp_path / "train_series_descriptions.csv"
    csv_path.write_text(
        "study_id,series_id,series_description\n"
        "100,7,Sagittal T2/STIR\n"
        "100,8,Sagittal T2/STIR\n"
        "100,9,Sagittal T1\n"
        "200,7,Axial T2\n"
    )
    mapping = load_series_mapping(csv_path)
    assert get_series_type(7, 100, mapping) == "Sagittal T2/STIR"
    assert get_series_type(8, 100, mapping) == "Sagittal T2/STIR"
    assert get_series_type(9, 100, mapping) == "Sagittal T1"
    assert get_series_type(7, 200, mapping) == "Axial T2"
    assert get_series_type(9, 999, mapping) is None  # unknown study
    assert get_series_type(999, 100, mapping) is None  # unknown series
