"""Phenikaa report preprocessing: OCR extraction + fuzzy patient matching.

Capability parity with reference datasets/phenikaa/__init__.py:34-520.
Vietnamese report fields are fuzzy-located in OCR text lines; patients are
matched to image study folders by transliterated-name similarity with a
birth-year tiebreak; matched studies are copied and the label table filtered.
The OCR engine itself is this framework's batched TPU detection/recognition
stack (ocr.py); processors accept any engine satisfying the same interface,
so the pipeline is testable with fakes.
"""

from __future__ import annotations

import re
import shutil
from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path

from pydantic import computed_field

from spine_vision_tpu.core import BaseConfig, logger
from spine_vision_tpu.data.builders.base import ProcessingResult
from spine_vision_tpu.data.phenikaa.matching import (
    PatientMatcher,
    fuzzy_value_extract,
    fuzzy_value_extract_spatial,
)
from spine_vision_tpu.data.phenikaa.ocr import DocumentExtractor

# Vietnamese OCR field patterns (reference phenikaa/__init__.py:34-37).
NAME_FIELD_PATTERN = "Ho ten nguoi benh"
BIRTHDAY_FIELD_PATTERN = "Ngay sinh"
ID_FIELD_PATTERN = "So phieu"
ONE_HOT_COL = "Modic"

SUPPORTED_EXTENSIONS = (".pdf", ".png", ".jpg", ".jpeg")

# Report filename shapes (reference phenikaa/__init__.py:42-47).
PATIENT_NAMED_REPORT_REGEX = re.compile(
    r"^[a-zA-ZÀ-ỹ]+(?:[\s_][a-zA-ZÀ-ỹ]+)*(?:[\s_]\d{8})?$"
)
ID_NAMED_REPORT_REGEX = re.compile(r"^\d+$")

# Pixel crop (x1, y1, x2, y2) at 200 DPI where the report ID usually sits.
DEFAULT_PDF_ID_CROP_REGION: tuple[int, int, int, int] = (1100, 200, 1500, 400)


def _id_from_text(text: str) -> int | None:
    """Patient ID from an OCR line: the first contiguous run of >=6 digits.

    The reference strips ALL non-digits (re.sub(r"\\D", ...), reference
    phenikaa/__init__.py:214,259), which concatenates every number on the
    line — a date next to the ID corrupts it into a garbage (or worse,
    wrong-but-valid) ID. A contiguous-run match cannot cross other tokens;
    the reference's concatenation is kept as a fallback for IDs that OCR
    split internally (e.g. "2500 99999")."""
    match = re.search(r"\d{6,}", text)
    if match is None:
        # OCR sometimes splits an ID with spaces ("2500 99999"): collapse
        # whitespace ONLY and retry — collapsing every non-digit (the
        # reference's behavior) would also weld date fragments (15/05/2024)
        # into a plausible-looking ID.
        match = re.search(r"\d{6,}", re.sub(r"\s", "", text))
    return int(match.group()) if match else None


@dataclass
class ReportInfo:
    """Fields extracted from one medical report."""

    patient_id: int | None
    patient_name: str | None
    patient_birthday: str | None
    source_path: Path


class ReportProcessor(ABC):
    """Strategy for one report-filename convention."""

    @abstractmethod
    def can_process(self, report_path: Path) -> bool: ...

    @abstractmethod
    def process(
        self,
        report_path: Path,
        extractor: DocumentExtractor,
        fuzzy_threshold: float,
    ) -> ReportInfo | None: ...


class IdNamedReportProcessor(ReportProcessor):
    """Reports named by numeric patient ID; name/birthday come from OCR
    (reference phenikaa/__init__.py:83-131)."""

    def can_process(self, report_path: Path) -> bool:
        return ID_NAMED_REPORT_REGEX.match(report_path.stem) is not None

    def process(
        self,
        report_path: Path,
        extractor: DocumentExtractor,
        fuzzy_threshold: float,
    ) -> ReportInfo | None:
        try:
            patient_id = int(report_path.stem)
        except ValueError:
            logger.warning("Could not parse ID from filename: %s", report_path.name)
            return None

        lines = extractor.extract_lines(report_path)
        if not lines:
            logger.warning("No text extracted from report: %s", report_path)
            return None

        # Layout-aware extraction: same-line key/value split first (the
        # reference's behavior), then the spatial label-beside/below
        # fallback for real report layouts (matching.py).
        patient_name = fuzzy_value_extract_spatial(
            lines, NAME_FIELD_PATTERN, fuzzy_threshold, window_length=3
        )
        if not patient_name:
            logger.warning("Could not extract name for ID %d", patient_id)
            return None

        patient_birthday = fuzzy_value_extract_spatial(
            lines, BIRTHDAY_FIELD_PATTERN, fuzzy_threshold, window_length=2
        )
        if not patient_birthday:
            logger.warning("Could not extract birthday for ID %d", patient_id)
            return None

        return ReportInfo(
            patient_id=patient_id,
            patient_name=patient_name,
            patient_birthday=patient_birthday,
            source_path=report_path,
        )


class PatientNamedReportProcessor(ReportProcessor):
    """Reports named by patient name; the ID comes from OCR, with a PDF
    crop-region fast path (reference phenikaa/__init__.py:135-287)."""

    def __init__(
        self,
        pdf_id_crop_region: tuple[int, int, int, int] = DEFAULT_PDF_ID_CROP_REGION,
    ) -> None:
        self.pdf_id_crop_region = pdf_id_crop_region

    def can_process(self, report_path: Path) -> bool:
        return PATIENT_NAMED_REPORT_REGEX.match(report_path.stem) is not None

    @staticmethod
    def _parse_filename(stem: str) -> tuple[str, str | None]:
        # Split on spaces AND underscores: PATIENT_NAMED_REPORT_REGEX admits
        # both separators, but the reference splits on '_' only, leaving a
        # trailing date inside space-separated names (reference
        # phenikaa/__init__.py:170 — bug fixed here, see MIGRATION.md).
        parts = [p for p in re.split(r"[\s_]+", stem) if p]
        if len(parts) >= 2 and re.match(r"^\d{8}$", parts[-1]):
            return "".join(parts[:-1]), parts[-1]
        return "".join(parts), None

    def _extract_id_from_pdf_crop(
        self, report_path: Path, extractor: DocumentExtractor
    ) -> int | None:
        try:
            text_lines = extractor.extract_from_pdf_crop(
                report_path, self.pdf_id_crop_region
            )
        except Exception as exc:
            logger.debug("Failed to extract from PDF crop: %s", exc)
            return None
        for line in text_lines:
            patient_id = _id_from_text(line)
            if patient_id is not None:
                return patient_id
        return None

    def process(
        self,
        report_path: Path,
        extractor: DocumentExtractor,
        fuzzy_threshold: float,
    ) -> ReportInfo | None:
        patient_name, _ = self._parse_filename(report_path.stem)

        patient_id: int | None = None
        if report_path.suffix.lower() == ".pdf":
            patient_id = self._extract_id_from_pdf_crop(report_path, extractor)
            if patient_id:
                logger.debug("Extracted ID %d from PDF crop region", patient_id)

        lines: list | None = None
        if patient_id is None:
            lines = extractor.extract_lines(report_path)
            if not lines:
                logger.warning("No text extracted from report: %s", report_path)
                return None
            id_str = fuzzy_value_extract_spatial(
                lines, ID_FIELD_PATTERN, fuzzy_threshold, window_length=2
            )
            patient_id = _id_from_text(id_str or "")
            if patient_id is None:
                logger.warning("Could not extract ID for patient: %s", patient_name)
                return None

        if lines is None:
            lines = extractor.extract_lines(report_path)
        patient_birthday = (
            fuzzy_value_extract_spatial(
                lines, BIRTHDAY_FIELD_PATTERN, fuzzy_threshold, window_length=2
            )
            if lines
            else None
        )

        return ReportInfo(
            patient_id=patient_id,
            patient_name=patient_name,
            patient_birthday=patient_birthday,
            source_path=report_path,
        )


class ReportProcessorRegistry:
    """Chain-of-responsibility over processors
    (reference phenikaa/__init__.py:290-326)."""

    def __init__(self) -> None:
        self._processors: list[ReportProcessor] = []

    def register(self, processor: ReportProcessor) -> None:
        self._processors.append(processor)

    def process(
        self,
        report_path: Path,
        extractor: DocumentExtractor,
        fuzzy_threshold: float,
    ) -> ReportInfo | None:
        for processor in self._processors:
            if processor.can_process(report_path):
                return processor.process(report_path, extractor, fuzzy_threshold)
        logger.debug("No processor matched: %s", report_path.name)
        return None


def build_report_processor_registry(
    pdf_id_crop_region: tuple[int, int, int, int] = DEFAULT_PDF_ID_CROP_REGION,
) -> ReportProcessorRegistry:
    registry = ReportProcessorRegistry()
    registry.register(IdNamedReportProcessor())
    registry.register(PatientNamedReportProcessor(pdf_id_crop_region))
    return registry


def collect_report_files(report_path: Path) -> list[Path]:
    """All supported report files under a directory (extension matching is
    case-insensitive: scanners commonly emit .PDF/.JPG)."""
    extensions = {ext.lower() for ext in SUPPORTED_EXTENSIONS}
    report_files = sorted(
        p
        for p in Path(report_path).rglob("*")
        if p.is_file() and p.suffix.lower() in extensions
    )
    logger.info("Found %d report files", len(report_files))
    return report_files


class PreprocessConfig(BaseConfig):
    """Phenikaa preprocessing configuration
    (reference phenikaa/__init__.py:347-401)."""

    data_path: Path = Path("data/raw/Phenikaa")
    exclude_files: list[str] = []
    id_col: str = "Patient ID"
    corrupted_ids: list[int] = [
        25001,
        250027783,
        250026093,
        250026925,
        250026665,
        250010269,
    ]
    output_table: str = "radiological_labels.csv"
    detection_checkpoint: Path | None = None
    recognition_checkpoint: Path | None = None
    report_fuzzy_threshold: float = 80
    image_fuzzy_threshold: float = 85
    pdf_dpi: int = 200
    pdf_id_crop_region: tuple[int, int, int, int] = DEFAULT_PDF_ID_CROP_REGION

    output_path: Path = Path("data/interim/Phenikaa")

    @computed_field  # type: ignore[prop-decorator]
    @property
    def image_path(self) -> Path:
        return self.data_path / "images"

    @computed_field  # type: ignore[prop-decorator]
    @property
    def report_path(self) -> Path:
        return self.data_path / "labels" / "reports"

    @computed_field  # type: ignore[prop-decorator]
    @property
    def table_path(self) -> Path:
        return self.data_path / "labels" / "tables"

    @computed_field  # type: ignore[prop-decorator]
    @property
    def output_table_path(self) -> Path:
        return self.output_path / self.output_table

    @computed_field  # type: ignore[prop-decorator]
    @property
    def output_image_path(self) -> Path:
        return self.output_path / "images"


def preprocess_phenikaa(
    config: PreprocessConfig,
    extractor: DocumentExtractor | None = None,
) -> ProcessingResult:
    """OCR each report, fuzzy-match to a study folder, copy matched studies,
    and write the filtered label table (reference phenikaa/__init__.py:404-520).

    Args:
        config: Pipeline configuration.
        extractor: Optional pre-built OCR engine (tests inject fakes here).
    """
    from spine_vision_tpu.io import load_tabular_data

    label_data = load_tabular_data(
        table_path=config.table_path,
        exclude_files=config.exclude_files,
        id_col=config.id_col,
        corrupted_ids=config.corrupted_ids,
        one_hot_col=ONE_HOT_COL,
    )
    if label_data.empty:
        logger.info("No valid data found at %s", config.table_path)
        return ProcessingResult(
            num_samples=0,
            output_path=config.output_path,
            summary="No valid data found",
        )
    label_data = label_data.astype(int)
    logger.debug("Unique patients: %d", label_data[config.id_col].nunique())

    if extractor is None:
        logger.info("Loading OCR models.")
        extractor = _build_extractor(config)

    report_files = collect_report_files(config.report_path)
    registry = build_report_processor_registry(config.pdf_id_crop_region)
    matcher = PatientMatcher(
        image_path=config.image_path, threshold=config.image_fuzzy_threshold
    )

    valid_ids = set(label_data[config.id_col].unique())
    matched_ids: list[int] = []
    matched_set: set[int] = set()

    for report_path in report_files:
        # ID-named reports reveal their ID before any OCR: skip unlabeled
        # ones up front rather than paying a full-page OCR pass only to
        # discard the result at the valid_ids check below.
        if ID_NAMED_REPORT_REGEX.match(report_path.stem):
            stem_id = int(report_path.stem)
            if stem_id not in valid_ids:
                logger.debug("ID %d not in label data, skipping", stem_id)
                continue
            if stem_id in matched_set:
                logger.warning(
                    "Duplicate report for already-matched ID %d: %s (skipped "
                    "to avoid merging two source folders)", stem_id, report_path,
                )
                continue
        info = registry.process(
            report_path, extractor, config.report_fuzzy_threshold
        )
        if not info or info.patient_id is None:
            continue
        if info.patient_id not in valid_ids:
            logger.debug("ID %d not in label data, skipping", info.patient_id)
            continue
        if info.patient_id in matched_set:
            logger.warning(
                "Duplicate report for already-matched ID %d: %s (skipped to "
                "avoid merging two source folders)", info.patient_id, report_path,
            )
            continue

        if info.patient_name and info.patient_birthday:
            best_folder = matcher.match(info.patient_name, info.patient_birthday)
        elif info.patient_name:
            best_folder = matcher.match_by_name(info.patient_name)
        else:
            best_folder = None

        if best_folder:
            dest = config.output_image_path / str(info.patient_id)
            shutil.copytree(best_folder, dest, dirs_exist_ok=True)
            logger.info("Copied %s -> %s", best_folder.name, dest)
            matched_ids.append(info.patient_id)
            matched_set.add(info.patient_id)
        else:
            logger.warning(
                "No matching folder for '%s' (ID: %s)",
                info.patient_name,
                info.patient_id,
            )

    label_data = label_data[label_data[config.id_col].isin(matched_ids)]
    config.output_path.mkdir(parents=True, exist_ok=True)
    label_data.to_csv(config.output_table_path, index=False)
    logger.info("Saved table to %s", config.output_table_path)
    logger.info("Matched %d patients of %d", len(matched_ids), len(valid_ids))

    return ProcessingResult(
        num_samples=len(matched_ids),
        output_path=config.output_path,
        summary=f"Matched {len(matched_ids)} of {len(valid_ids)} patients",
    )


def _build_extractor(config: PreprocessConfig) -> DocumentExtractor:
    """Build the TPU OCR engine, loading orbax checkpoints when given."""
    from spine_vision_tpu.data.phenikaa.ocr import TextDetector, TextRecognizer

    det_vars = rec_vars = None
    if config.detection_checkpoint is not None:
        det_vars = _load_ocr_variables(config.detection_checkpoint)
    if config.recognition_checkpoint is not None:
        rec_vars = _load_ocr_variables(config.recognition_checkpoint)
    return DocumentExtractor(
        detector=TextDetector(variables=det_vars),
        recognizer=TextRecognizer(variables=rec_vars),
        pdf_dpi=config.pdf_dpi,
    )


def _load_ocr_variables(path: Path):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(Path(path).absolute())
