"""Classification dataset builder: mm-space IVD crops from SPIDER + Phenikaa.

Capability parity with reference datasets/classification/ (config.py:12-101,
spider.py:45-243, phenikaa.py:27-226, recovery.py:40-159, __init__.py:122-244)
re-architected for TPU: instead of a batch-1 localization forward plus cv2
warps per image (reference cropping.py:444-483, 258-354 — a host<->device
round trip per series), series slices are queued and flushed through the
fused ``SeriesCropPipeline`` in device batches: one compiled program performs
normalize -> localization -> rotation angles -> mm->px deltas -> fused
rotate/crop/letterbox for the whole batch. Volume decode and isotropic
resampling stay per-volume (io readers + the jitted trilinear kernel).
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterable

import numpy as np
from pydantic import computed_field

from spine_vision_tpu.core import BaseConfig, logger
from spine_vision_tpu.data.builders.base import ProcessingResult
from spine_vision_tpu.infer import SeriesCropPipeline, StudyPipelineConfig
from spine_vision_tpu.io import write_records_csv
from spine_vision_tpu.io.series import prepare_series_slice


class ClassificationDatasetConfig(BaseConfig):
    """Configuration (reference classification/config.py:12-83)."""

    base_path: Path = Path("data")
    output_name: str = "classification"

    localization_model_path: Path | None = None
    """Trained localization checkpoint (orbax dir). None = center fallback."""
    localization_backbone: str = "convnext_base"

    crop_size: tuple[int, int] = (256, 256)
    crop_delta_mm: tuple[float, float, float, float] = (55.0, 15.0, 17.5, 20.0)
    crop_mode: str = "horizontal"
    last_disc_angle_boost: float = 1.0
    image_size: tuple[int, int] = (512, 512)

    include_phenikaa: bool = True
    include_spider: bool = True
    append_to_existing: bool = True

    device_batch_size: int = 8
    """Series slices cropped per fused device dispatch."""
    data_parallel: bool = False
    """Shard each crop batch over ALL local devices (mesh data-parallel)."""
    padded_hw: tuple[int, int] = (1536, 1536)
    """Static slice buffer; isotropic 0.3 mm slices of lumbar MRI fit well
    within this."""

    @computed_field  # type: ignore[prop-decorator]
    @property
    def phenikaa_path(self) -> Path:
        return self.base_path / "interim" / "Phenikaa"

    @computed_field  # type: ignore[prop-decorator]
    @property
    def spider_path(self) -> Path:
        return self.base_path / "raw" / "SPIDER"

    @computed_field  # type: ignore[prop-decorator]
    @property
    def output_path(self) -> Path:
        return self.base_path / "processed" / self.output_name


@dataclass
class ClassificationRecord:
    """One IVD crop with its 8 grading labels
    (reference classification/config.py:86-101)."""

    image_path: str
    patient_id: str
    ivd_level: int
    series_type: str
    source: str
    pfirrmann_grade: int
    disc_herniation: int
    disc_narrowing: int
    disc_bulging: int
    spondylolisthesis: int
    modic: int
    up_endplate: int
    low_endplate: int


@dataclass
class ParsedImageInfo:
    """Metadata parsed from a crop filename (reference spider.py:183-196)."""

    source: str
    patient_id: str
    series_type: str
    ivd_level: int
    filename: str


_FILENAME_RE = re.compile(r"^(phenikaa|spider)_(.+)_(sag_t[12])_L(\d)\.png$")


def parse_image_filename(filename: str) -> ParsedImageInfo | None:
    """Parse ``{source}_{patient}_{series}_L{level}.png``
    (reference spider.py:196-224)."""
    match = _FILENAME_RE.match(filename)
    if not match:
        return None
    return ParsedImageInfo(
        source=match.group(1),
        patient_id=match.group(2),
        series_type=match.group(3),
        ivd_level=int(match.group(4)),
        filename=filename,
    )


def scan_existing_images(images_path: Path) -> list[ParsedImageInfo]:
    """Scan the crop directory for resumable work (reference spider.py:225-243)."""
    if not images_path.exists():
        return []
    return [
        info
        for f in sorted(images_path.glob("*.png"))
        if (info := parse_image_filename(f.name)) is not None
    ]


def convert_spider_to_phenikaa_level(spider_level: int) -> int:
    """SPIDER counts discs bottom-up (1=L5/S1); Phenikaa top-down (1=L1/L2)
    (reference spider.py:30-42)."""
    return 6 - spider_level


# ---------------------------------------------------------------------------
# Label loading
# ---------------------------------------------------------------------------


def _load_phenikaa_labels(labels_path: Path) -> dict[str, dict[int, dict]]:
    """patient -> level -> row (reference phenikaa.py:27-45)."""
    patient_labels: dict[str, dict[int, dict]] = {}
    with open(labels_path, newline="") as f:
        for row in csv.DictReader(f):
            patient_labels.setdefault(row["Patient ID"], {})[
                int(row["IVD label"])
            ] = row
    return patient_labels


def _load_spider_labels(labels_path: Path) -> dict[int, dict[int, dict]]:
    """patient -> phenikaa-level -> row (reference spider.py:71-82)."""
    patient_labels: dict[int, dict[int, dict]] = {}
    with open(labels_path, newline="") as f:
        for row in csv.DictReader(f):
            patient_id = int(row["Patient"])
            level = convert_spider_to_phenikaa_level(int(row["IVD label"]))
            patient_labels.setdefault(patient_id, {})[level] = row
    return patient_labels


def _record_from_row(
    filename: str,
    patient_id: str,
    ivd_level: int,
    series_type: str,
    label_row: dict,
    source: str,
) -> ClassificationRecord:
    """Build a record; Modic one-hot columns collapse to an ordinal for
    Phenikaa rows (reference phenikaa.py:67-109, spider passes ``Modic``)."""
    if "Modic" in label_row:
        modic = int(label_row.get("Modic", 0))
    else:
        modic = 0
        for i in range(4):
            if str(label_row.get(f"Modic_{i}", "0")) == "1":
                modic = i
                break
    return ClassificationRecord(
        image_path=f"images/{filename}",
        patient_id=str(patient_id),
        ivd_level=ivd_level,
        series_type=series_type,
        source=source,
        pfirrmann_grade=int(label_row.get("Pfirrman grade", 0)),
        disc_herniation=int(label_row.get("Disc herniation", 0)),
        disc_narrowing=int(label_row.get("Disc narrowing", 0)),
        disc_bulging=int(label_row.get("Disc bulging", 0)),
        spondylolisthesis=int(label_row.get("Spondylolisthesis", 0)),
        modic=modic,
        up_endplate=int(label_row.get("UP endplate", 0)),
        low_endplate=int(label_row.get("LOW endplate", 0)),
    )


# ---------------------------------------------------------------------------
# Annotation recovery (incremental builds; reference recovery.py:40-159)
# ---------------------------------------------------------------------------


def recover_phenikaa_annotations(
    existing_images: list[ParsedImageInfo], labels_path: Path
) -> list[ClassificationRecord]:
    """Rebuild records for on-disk Phenikaa crops from the source labels."""
    if not labels_path.exists():
        logger.warning("Cannot recover Phenikaa annotations: %s missing", labels_path)
        return []
    patient_labels = _load_phenikaa_labels(labels_path)
    records = []
    for info in existing_images:
        if info.source != "phenikaa":
            continue
        row = patient_labels.get(info.patient_id, {}).get(info.ivd_level)
        if row is None:
            logger.debug("No labels for %s L%d", info.patient_id, info.ivd_level)
            continue
        records.append(
            _record_from_row(
                info.filename,
                info.patient_id,
                info.ivd_level,
                info.series_type,
                row,
                "phenikaa",
            )
        )
    return records


def recover_spider_annotations(
    existing_images: list[ParsedImageInfo], labels_path: Path
) -> list[ClassificationRecord]:
    """Rebuild records for on-disk SPIDER crops (with level conversion)."""
    if not labels_path.exists():
        logger.warning("Cannot recover SPIDER annotations: %s missing", labels_path)
        return []
    patient_labels = _load_spider_labels(labels_path)
    records = []
    for info in existing_images:
        if info.source != "spider":
            continue
        try:
            patient_id = int(info.patient_id)
        except ValueError:
            logger.debug("Invalid SPIDER patient ID: %s", info.patient_id)
            continue
        row = patient_labels.get(patient_id, {}).get(info.ivd_level)
        if row is None:
            continue
        records.append(
            _record_from_row(
                info.filename,
                str(patient_id),
                info.ivd_level,
                info.series_type,
                row,
                "spider",
            )
        )
    return records


# ---------------------------------------------------------------------------
# Batched crop extraction
# ---------------------------------------------------------------------------


@dataclass
class _SeriesWork:
    """One series slice queued for the fused device batch."""

    source: str
    patient_id: str
    series_type: str
    slice_2d: np.ndarray
    spacing: tuple[float, float]
    levels: dict[int, dict]  # phenikaa-level -> label row


def _prepare_series(path: Path) -> tuple[np.ndarray, tuple[float, float]]:
    """Decode + isotropic middle sagittal slice + 2D spacing (io.series:
    equals the reference's full-volume resample + orient + slice chain,
    computed directly)."""
    return prepare_series_slice(path)


class _CropBatcher:
    """Accumulates series and flushes them through the fused device pipeline."""

    def __init__(
        self,
        pipeline: SeriesCropPipeline,
        output_images_path: Path,
        batch_size: int,
    ) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self.pipeline = pipeline
        self.output_images_path = output_images_path
        self.batch_size = batch_size
        self.queue: list[_SeriesWork] = []
        self.records: list[ClassificationRecord] = []
        # PNG encoding of batch N overlaps the device crop of batch N+1
        # (one writer thread keeps record order deterministic); records are
        # read only after finish().
        self._writer = ThreadPoolExecutor(max_workers=1)
        self._writes: list = []

    def add(self, work: _SeriesWork) -> None:
        self.queue.append(work)
        if len(self.queue) >= self.batch_size:
            self.flush()

    def flush(self) -> None:
        if not self.queue:
            return
        # Surface a writer failure NOW rather than after hours of further
        # decode/crop work: a done future with an exception re-raises here.
        for future in self._writes:
            if future.done():
                future.result()
        self._writes = [f for f in self._writes if not f.done()]
        batch = self.queue
        self.queue = []
        _, _, crops = self.pipeline.run(
            [w.slice_2d for w in batch], [w.spacing for w in batch]
        )
        self._writes.append(self._writer.submit(self._write_batch, batch, crops))

    def _write_batch(self, batch: list, crops: Any) -> None:
        from PIL import Image

        for work, series_crops in zip(batch, crops):
            for ivd_level, label_row in work.levels.items():
                crop = series_crops[ivd_level - 1]
                filename = (
                    f"{work.source}_{work.patient_id}_{work.series_type}"
                    f"_L{ivd_level}.png"
                )
                Image.fromarray(crop).save(self.output_images_path / filename)
                self.records.append(
                    _record_from_row(
                        filename,
                        work.patient_id,
                        ivd_level,
                        work.series_type,
                        label_row,
                        work.source,
                    )
                )

    def finish(self) -> None:
        """Flush the queue and wait for all pending PNG writes."""
        try:
            self.flush()
            for future in self._writes:
                future.result()  # surface writer exceptions
            self._writes = []
        finally:
            self._writer.shutdown(wait=True)


def process_spider(
    config: ClassificationDatasetConfig,
    batcher: _CropBatcher,
    existing_image_paths: set[str],
) -> int:
    """Queue SPIDER series (.mha per patient/series) for cropping
    (reference spider.py:45-178)."""
    labels_path = config.spider_path / "radiological_gradings.csv"
    images_path = config.spider_path / "images"
    if not labels_path.exists():
        logger.warning("SPIDER labels not found: %s", labels_path)
        return 0

    patient_labels = _load_spider_labels(labels_path)
    queued = 0
    for patient_id, levels in patient_labels.items():
        for series_suffix, series_type in (("t1", "sag_t1"), ("t2", "sag_t2")):
            image_file = images_path / f"{patient_id}_{series_suffix}.mha"
            if not image_file.exists():
                continue
            todo = {
                lvl: row
                for lvl, row in levels.items()
                if 1 <= lvl <= 5
                and f"images/spider_{patient_id}_{series_type}_L{lvl}.png"
                not in existing_image_paths
            }
            if not todo:
                continue
            try:
                slice_2d, spacing = _prepare_series(image_file)
            except Exception as exc:
                logger.debug("Error processing %s: %s", image_file, exc)
                continue
            batcher.add(
                _SeriesWork(
                    source="spider",
                    patient_id=str(patient_id),
                    series_type=series_type,
                    slice_2d=slice_2d,
                    spacing=spacing,
                    levels=todo,
                )
            )
            queued += 1
    return queued


def _find_series_directory(patient_dir: Path, series_pattern: str) -> Path | None:
    """Case/space-insensitive series directory lookup
    (reference phenikaa.py:48-64)."""
    normalized = series_pattern.lower().replace(" ", "")
    for subdir in patient_dir.iterdir():
        if subdir.is_dir() and subdir.name.lower().replace(" ", "") == normalized:
            return subdir
    return None


def process_phenikaa(
    config: ClassificationDatasetConfig,
    batcher: _CropBatcher,
    existing_image_paths: set[str],
) -> int:
    """Queue Phenikaa series (DICOM dirs) for cropping
    (reference phenikaa.py:112-226)."""
    labels_path = config.phenikaa_path / "radiological_labels.csv"
    images_path = config.phenikaa_path / "images"
    if not labels_path.exists():
        logger.warning("Phenikaa labels not found: %s", labels_path)
        return 0

    patient_labels = _load_phenikaa_labels(labels_path)
    queued = 0
    for patient_id, levels in patient_labels.items():
        patient_dir = images_path / patient_id
        if not patient_dir.exists():
            logger.debug("Patient directory not found: %s", patient_dir)
            continue
        for series_pattern, series_type in (("sag t1", "sag_t1"), ("sag t2", "sag_t2")):
            series_dir = _find_series_directory(patient_dir, series_pattern)
            if series_dir is None:
                continue
            todo = {
                lvl: row
                for lvl, row in levels.items()
                if 1 <= lvl <= 5
                and f"images/phenikaa_{patient_id}_{series_type}_L{lvl}.png"
                not in existing_image_paths
            }
            if not todo:
                continue
            try:
                slice_2d, spacing = _prepare_series(series_dir)
            except Exception as exc:
                logger.debug("Error reading %s: %s", series_dir, exc)
                continue
            batcher.add(
                _SeriesWork(
                    source="phenikaa",
                    patient_id=patient_id,
                    series_type=series_type,
                    slice_2d=slice_2d,
                    spacing=spacing,
                    levels=todo,
                )
            )
            queued += 1
    return queued


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _build_pipeline(config: ClassificationDatasetConfig) -> SeriesCropPipeline:
    pipe_config = StudyPipelineConfig(
        loc_image_size=config.image_size,
        crop_size=config.crop_size,
        crop_delta_mm=config.crop_delta_mm,
        crop_mode=config.crop_mode,
        last_disc_angle_boost=config.last_disc_angle_boost,
        padded_hw=config.padded_hw,
    )
    mesh = None
    if config.data_parallel:
        from spine_vision_tpu.parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
        logger.info("Cropping data-parallel over %d devices", mesh.size)
    if config.localization_model_path is None:
        logger.info("No localization model; using center fallback locations")
        return SeriesCropPipeline(None, None, config=pipe_config, mesh=mesh)

    import jax
    import jax.numpy as jnp
    import optax

    from spine_vision_tpu.models import CoordinateRegressor
    from spine_vision_tpu.train.checkpoint import load_checkpoint
    from spine_vision_tpu.train.state import TrainState

    logger.info("Loading localization model: %s", config.localization_model_path)
    model = CoordinateRegressor(
        backbone_name=config.localization_backbone, dtype=jnp.bfloat16
    )
    lh, lw = config.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, lh, lw, 3), jnp.bfloat16), train=False
    )
    state = TrainState.create(
        params=variables["params"],
        tx=optax.identity(),
        batch_stats=variables.get("batch_stats"),
    )
    state, _ = load_checkpoint(
        config.localization_model_path, state, restore_opt_state=False
    )
    return SeriesCropPipeline(model, state.variables(), config=pipe_config, mesh=mesh)


def log_dataset_summary(records: Iterable[ClassificationRecord]) -> None:
    """Source/series/level summary (reference classification/__init__.py:46-82)."""
    records = list(records)
    by: dict[str, dict[Any, int]] = {"source": {}, "series": {}, "level": {}}
    for r in records:
        by["source"][r.source] = by["source"].get(r.source, 0) + 1
        by["series"][r.series_type] = by["series"].get(r.series_type, 0) + 1
        by["level"][r.ivd_level] = by["level"].get(r.ivd_level, 0) + 1
    logger.info("Classification dataset: %d records", len(records))
    for key, counts in by.items():
        logger.info("  by %s: %s", key, dict(sorted(counts.items())))


def create_classification_dataset(
    config: ClassificationDatasetConfig,
) -> ProcessingResult:
    """Filesystem-resumable two-source crop dataset build
    (reference classification/__init__.py:122-244)."""
    csv_path = config.output_path / "annotations.csv"
    output_images_path = config.output_path / "images"
    output_images_path.mkdir(parents=True, exist_ok=True)

    existing_images = scan_existing_images(output_images_path)
    existing_image_paths: set[str] = set()
    recovered: list[ClassificationRecord] = []
    if existing_images and config.append_to_existing:
        logger.info("Found %d existing images on disk", len(existing_images))
        existing_image_paths = {f"images/{i.filename}" for i in existing_images}
        recovered = recover_phenikaa_annotations(
            existing_images, config.phenikaa_path / "radiological_labels.csv"
        ) + recover_spider_annotations(
            existing_images, config.spider_path / "radiological_gradings.csv"
        )
        logger.info("Recovered annotations for %d existing images", len(recovered))
        orphans = len(existing_images) - len(recovered)
        if orphans > 0:
            logger.warning("%d existing images have no matching labels", orphans)

    pipeline = _build_pipeline(config)
    batcher = _CropBatcher(
        pipeline, output_images_path, batch_size=config.device_batch_size
    )

    queued = 0
    if config.include_phenikaa:
        queued += process_phenikaa(config, batcher, existing_image_paths)
    if config.include_spider:
        queued += process_spider(config, batcher, existing_image_paths)
    batcher.finish()

    all_records = recovered + batcher.records
    if all_records:
        write_records_csv(all_records, csv_path)
    log_dataset_summary(all_records)
    logger.info(
        "Processed %d new series (%d new records, %d recovered)",
        queued,
        len(batcher.records),
        len(recovered),
    )

    return ProcessingResult(
        num_samples=len(all_records),
        output_path=config.output_path,
        summary=(
            f"Classification dataset: {len(all_records)} records "
            f"({len(batcher.records)} new, {len(recovered)} recovered)"
        ),
    )
