"""Fuzzy patient/folder matching for Phenikaa report preprocessing.

Capability parity with reference datasets/phenikaa/matching.py:13-347.
Host-side string work (SURVEY.md §2.2: not perf-critical): rapidfuzz provides
the Levenshtein-family scores; Vietnamese diacritics are folded with a
unicodedata-based transliteration (the reference uses unidecode, which is not
bundled here — for Vietnamese text NFD-stripping plus the đ/Đ special case is
equivalent).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path

from rapidfuzz import fuzz

from spine_vision_tpu.core import logger


def ascii_fold(text: str) -> str:
    """Transliterate to ASCII: strip combining marks, map đ/Đ -> d/D."""
    text = text.replace("đ", "d").replace("Đ", "D")
    decomposed = unicodedata.normalize("NFD", text)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def fuzzy_match_score(text1: str, text2: str, normalize: bool = True) -> float:
    """Partial-ratio score in [0, 100], optionally diacritic/case-folded."""
    if normalize:
        text1 = ascii_fold(text1).lower().strip()
        text2 = ascii_fold(text2).lower().strip()
    return fuzz.partial_ratio(text1, text2)


def fuzzy_value_extract(
    text_lines: list[str],
    field: str,
    threshold: float = 80,
    window_length: int = 2,
) -> str | None:
    """Extract the value following a fuzzy-matched field key in OCR lines.

    Slides a word window over each line to split it into (key ~ field, value)
    at the boundary maximizing the key's full-ratio score; returns the value
    uppercased (reference matching.py:30-84).
    """
    field = field.lower()
    for line in text_lines:
        normalized = ascii_fold(line).lower().strip()
        if fuzz.partial_ratio(field, normalized) <= threshold:
            continue

        key_word_count = len(field.split())
        words = normalized.split()
        if len(words) >= key_word_count:
            min_len = max(1, key_word_count - 1)
            max_len = min(len(words), key_word_count + window_length)
            best_score = 0.0
            best_end = 0
            for i in range(min_len, max_len + 1):
                candidate = " ".join(words[:i]).rstrip(" :.-")
                score = fuzz.ratio(field, candidate.lower())
                if score > best_score:
                    best_score = score
                    best_end = i
            if best_score >= threshold:
                return "".join(words[best_end:]).lstrip(".:;").upper()

        # Character-level fallback: CTC recognizers often drop spaces, so a
        # key+value line can arrive as one long word the word-window split
        # above cannot handle ("Ngàysinh:15/05/1980"). Scan split points of
        # the space-stripped folded line for the best key-prefix match; the
        # value is returned folded+uppercased like the word path's.
        compact = normalized.replace(" ", "")
        field_compact = field.replace(" ", "")
        lo = max(1, len(field_compact) - 4)
        hi = min(len(compact) - 1, len(field_compact) + 4)
        best_score, best_k = 0.0, 0
        for k in range(lo, hi + 1):
            score = fuzz.ratio(field_compact, compact[:k].rstrip(" :.-"))
            if score > best_score:
                best_score, best_k = score, k
        if best_score >= threshold:
            value = compact[best_k:].lstrip(".:;").upper()
            if value:
                return value
    return None


def fuzzy_value_extract_spatial(
    lines: list[tuple[str, "np.ndarray"]],
    field: str,
    threshold: float = 80,
    window_length: int = 2,
) -> str | None:
    """Layout-aware field extraction over (text, quad) OCR lines.

    First applies the reference's same-line key/value split
    (:func:`fuzzy_value_extract`). When that fails — real report layouts
    print the label on its own line with the value BELOW it (boxed report
    numbers) or in a separate column BESIDE it, which per-line splitting
    cannot recover (the reference papers over this with a fixed PDF
    crop-region fast path, reference phenikaa/__init__.py:135-287;
    ocr.py:283-323) — it finds the line whose whole text matches the field
    as a bare label and returns the text of the nearest detected line
    either to its right with vertical overlap, or below it with horizontal
    overlap. Quads are the detector's [4, 2] (x, y) TL TR BR BL boxes.
    """
    import numpy as np

    texts = [t for t, _ in lines]
    value = fuzzy_value_extract(texts, field, threshold, window_length)
    if value:
        return value

    field_folded = field.lower()
    boxes = []
    for text, quad in lines:
        q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
        boxes.append((text, q[:, 0].min(), q[:, 0].max(), q[:, 1].min(), q[:, 1].max()))

    best_key = None
    best_score = 0.0
    for i, (text, *_rect) in enumerate(boxes):
        folded = ascii_fold(text).lower().strip().rstrip(" :.-")
        if not folded:
            continue
        score = fuzz.ratio(field_folded, folded)
        if score >= threshold and score > best_score:
            best_score = score
            best_key = i
    if best_key is None:
        return None

    _, kx1, kx2, ky1, ky2 = boxes[best_key]
    key_h = max(ky2 - ky1, 1.0)
    # Two tiers: a value in the key's own row (separate right-hand column)
    # beats anything below it — when both exist, the same-row box is the
    # pair. Distance caps keep a missed value from pairing the key with an
    # arbitrary far-away line.
    beside: list[tuple[float, str]] = []
    below: list[tuple[float, str]] = []
    for j, (text, x1, x2, y1, y2) in enumerate(boxes):
        if j == best_key or not text.strip():
            continue
        yc = (y1 + y2) / 2.0
        if (
            x1 >= kx2 - key_h
            and x1 - kx2 <= 10.0 * key_h
            and ky1 - key_h / 2 <= yc <= ky2 + key_h / 2
        ):
            beside.append((x1 - kx2, text))
        elif (
            ky2 - key_h / 2 <= y1 <= ky2 + 3.0 * key_h
            and min(x2, kx2) - max(x1, kx1) > 0
        ):
            below.append(((y1 - ky2) + abs(x1 - kx1) * 0.1, text))
    candidates = beside or below
    if not candidates:
        return None
    best_value = min(candidates)[1]
    folded_value = ascii_fold(best_value).replace(" ", "")
    return folded_value.lstrip(".:;").upper() or None


def fuzzy_find_best_match(
    query: str,
    candidates: list[str],
    threshold: float = 80,
    normalize: bool = True,
) -> tuple[str | None, float]:
    """Best-scoring candidate above threshold, with its score."""
    best_match = None
    best_score = 0.0
    for candidate in candidates:
        score = fuzzy_match_score(query, candidate, normalize)
        if score > best_score:
            best_score = score
            best_match = candidate
    if best_score >= threshold:
        return best_match, best_score
    return None, best_score


# Patient image folder names: NAME(_YYYY)?_YYYYMMDD( (N))?
IMAGE_FOLDER_REGEX = re.compile(r"^[A-Z_]+(_\d{4})?_\d{8}( \(\d+\))?$")


@dataclass
class FolderInfo:
    """Parsed patient image folder."""

    path: Path
    name_part: str
    birth_year: str | None


def parse_image_folder_name(folder_name: str) -> tuple[str, str | None]:
    """Split ``PATIENT_NAME(_YYYY)_YYYYMMDD( (N))`` into (name, birth_year)."""
    base_name = re.sub(r" \(\d+\)$", "", folder_name)
    parts = base_name.split("_")
    if len(parts) >= 3 and re.fullmatch(r"\d{4}", parts[-2]):
        return "".join(parts[:-2]), parts[-2]
    return "".join(parts[:-1]), None


def build_folder_lookup(image_path: Path) -> dict[str, FolderInfo]:
    """Recursively index patient folders (key = unique folder path).

    Deviation from the reference (matching.py:158-186): the reference keys
    the dict by ``name(_birthyear)``, so a patient with two study dates
    (``NAME_20230101`` and ``NAME_20230601``) or two same-named patients
    without a birth year in the folder name silently overwrite each other —
    every matcher consumes ``.values()``, so the shadowed study can never be
    matched again. Keying by the full path keeps every folder visible;
    the name/birth-year semantics live in ``FolderInfo`` where the matchers
    actually read them.
    """
    folder_dict: dict[str, FolderInfo] = {}
    for path in Path(image_path).rglob("*"):
        if not path.is_dir() or not IMAGE_FOLDER_REGEX.match(path.name):
            continue
        name_part, birth_year = parse_image_folder_name(path.name)
        folder_dict[str(path)] = FolderInfo(
            path=path, name_part=name_part, birth_year=birth_year
        )
    return folder_dict


def find_matching_folder(
    patient_name: str,
    patient_birthday: str,
    folder_map: dict[str, FolderInfo],
    threshold: float = 85,
    date_format: str = "%d/%m/%Y",
) -> Path | None:
    """Best name-similarity folder with birth-year tiebreak
    (reference matching.py:189-247)."""
    try:
        patient_birth_year: int | None = datetime.strptime(
            patient_birthday, date_format
        ).year
    except ValueError:
        logger.warning("Could not parse birthday: %s", patient_birthday)
        patient_birth_year = None

    candidates = []
    for info in folder_map.values():
        # Diacritic/case folding on both sides: filename-derived names keep
        # Vietnamese diacritics while folder names are uppercase ASCII — the
        # reference compares them raw (matching.py:189-247) and silently
        # drops every such study; folding is the intended semantics.
        score = fuzzy_match_score(patient_name, info.name_part)
        if score > threshold:
            candidates.append((score, info))
    if not candidates:
        return None

    candidates.sort(key=lambda c: c[0], reverse=True)
    best_score = candidates[0][0]
    top = [info for score, info in candidates if score == best_score]

    if patient_birth_year is not None:
        for info in top:
            if info.birth_year == str(patient_birth_year):
                return info.path
    for info in top:
        if info.birth_year is None:
            return info.path
    return top[0].path if top else None


def find_matching_folder_by_name(
    patient_name: str,
    folder_map: dict[str, FolderInfo],
    threshold: float = 85,
) -> Path | None:
    """Name-only variant (used when no birthday is available)."""
    best: tuple[float, FolderInfo] | None = None
    for info in folder_map.values():
        score = fuzzy_match_score(patient_name, info.name_part)
        if score > threshold and (best is None or score > best[0]):
            best = (score, info)
    return best[1].path if best else None


class PatientMatcher:
    """Stateful folder matcher (reference matching.py:290-347)."""

    def __init__(
        self,
        image_path: Path,
        threshold: float = 85,
        date_format: str = "%d/%m/%Y",
    ) -> None:
        self.threshold = threshold
        self.date_format = date_format
        self.folder_map = build_folder_lookup(image_path)
        logger.info("Built folder lookup with %d entries", len(self.folder_map))

    def match(self, patient_name: str, patient_birthday: str) -> Path | None:
        return find_matching_folder(
            patient_name,
            patient_birthday,
            self.folder_map,
            self.threshold,
            self.date_format,
        )

    def match_by_name(self, patient_name: str) -> Path | None:
        return find_matching_folder_by_name(
            patient_name, self.folder_map, self.threshold
        )
