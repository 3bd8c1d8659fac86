"""OCR engine: batched TPU text detection + recognition for report parsing.

Capability parity with reference datasets/phenikaa/ocr.py:24-323, replacing
the PaddleOCR/VietOCR native stacks (SURVEY.md §2.2) with this framework's
Flax nets. Structural improvements over the reference:

- Recognition is genuinely batched: all detected boxes of a page rectify in
  one fused device pass (ops.warp.rectify_polygons) and recognize as one
  batch (the reference loops box-by-box, ocr.py:136-145).
- Detector/recognizer satisfy tiny Protocols, so the Phenikaa preprocessing
  pipeline is testable with fake engines (SURVEY.md §4).

Weight loading: both nets default to the in-repo checkpoints trained on
rendered Vietnamese report text (spine_vision_tpu/weights/ocr_*.npz,
produced by train.ocr.train_ocr_stack; CER / box-recall in BASELINE.md).
Explicit ``variables`` override them; if neither exists they fall back to
random initialization with a warning (shape/pipeline tests only —
pretrained Paddle/VietOCR weights cannot be loaded, the architectures
intentionally differ).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.core import logger
from spine_vision_tpu.models.textdet import (
    TextDetectionNet,
    extract_boxes_from_probmap,
)
from spine_vision_tpu.models.textrec import TextRecognitionNet, ctc_greedy_decode
from spine_vision_tpu.ops.warp import rectify_polygons


class Detector(Protocol):
    """Text detector protocol: image -> [N, 4, 2] polygons."""

    def detect(self, image: np.ndarray) -> np.ndarray: ...


class Recognizer(Protocol):
    """Text recognizer protocol: patches [N, h, w] -> N strings."""

    def recognize_batch(self, patches: np.ndarray) -> list[str]: ...


def _load_default_weights(name: str) -> Any | None:
    """Load a shipped weight file (weights/<name>.npz) if present."""
    from spine_vision_tpu.train.ocr import DEFAULT_WEIGHTS_DIR, load_variables_npz

    path = DEFAULT_WEIGHTS_DIR / f"{name}.npz"
    if path.exists():
        logger.info("Loading OCR weights: %s", path)
        return load_variables_npz(path)
    return None


def _to_gray_f32(image: np.ndarray) -> np.ndarray:
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr[..., :3].astype(np.float32).mean(axis=-1)
    return arr.astype(np.float32)


def _pad_to_multiple_2d(
    arr: np.ndarray, multiple: int, value: float = 0.0
) -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), constant_values=value)
    return arr


class TextDetector:
    """Flax DB-style detector wrapper (reference ocr.py:24-80)."""

    def __init__(
        self,
        variables: Any | None = None,
        input_multiple: int = 32,
        shape_bucket: int = 256,
        threshold: float = 0.3,
        seed: int = 0,
    ) -> None:
        self.model = TextDetectionNet()
        self.input_multiple = input_multiple
        # Pages pad to a multiple of this (>= input_multiple) so mixed-size
        # scans share compiled shapes instead of retracing per resolution,
        # the H/W analogue of the recognizer's power-of-two N bucket.
        self.shape_bucket = max(shape_bucket, input_multiple)
        self.threshold = threshold
        self._variables = variables
        self._seed = seed
        self._forward = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )

    def _ensure_variables(self, example: jnp.ndarray) -> Any:
        if self._variables is None:
            self._variables = _load_default_weights("ocr_detector")
        if self._variables is None:
            logger.warning(
                "TextDetector running with randomly initialized weights"
            )
            self._variables = self.model.init(
                jax.random.PRNGKey(self._seed), example, train=False
            )
        return self._variables

    def detect(self, image: np.ndarray) -> np.ndarray:
        """Detect text regions; returns [N, 4, 2] quads (TL TR BR BL)."""
        return self.detect_batch([image])[0]

    def detect_batch(self, images: list[np.ndarray]) -> list[np.ndarray]:
        """Detect text on a batch of pages in ONE device forward.

        Pages pad to the batch's max bucketed shape, and the page count pads
        to a power of two, so mixed workloads reuse compiled shapes. One
        forward + one fetch per batch — the per-page dispatch round trip
        (the cost that made the reference's serial loop slow,
        reference ocr.py:136-145) is amortized across the whole batch.
        """
        if not images:
            return []
        grays = [
            # Pad with WHITE (1.0): report pages are dark ink on white, so a
            # zero (black) band reads as a giant text stroke to the detector.
            _pad_to_multiple_2d(
                _to_gray_f32(im) / 255.0, self.shape_bucket, value=1.0
            )
            for im in images
        ]
        hmax = max(g.shape[0] for g in grays)
        wmax = max(g.shape[1] for g in grays)
        n = len(grays)
        bucket = 1 << (n - 1).bit_length()
        stacked = np.ones((bucket, hmax, wmax), dtype=np.float32)
        for i, g in enumerate(grays):
            stacked[i, : g.shape[0], : g.shape[1]] = g
        batch = jnp.asarray(stacked)[..., None]
        variables = self._ensure_variables(batch)
        probs = np.asarray(self._forward(variables, batch))[:n, :, :, 0]
        return [
            extract_boxes_from_probmap(p, threshold=self.threshold, scale=2.0)
            for p in probs
        ]


class TextRecognizer:
    """Flax CTC recognizer wrapper; batched (reference ocr.py:83-145)."""

    def __init__(
        self,
        variables: Any | None = None,
        patch_height: int = 32,
        patch_width: int = 256,
        seed: int = 0,
    ) -> None:
        if patch_height != 32:
            raise ValueError(
                "TextRecognitionNet's conv stack pools height 32 -> 1; "
                f"patch_height={patch_height} would silently discard rows"
            )
        self.model = TextRecognitionNet()
        self.patch_height = patch_height
        self.patch_width = patch_width
        self._variables = variables
        self._seed = seed
        self._forward = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )

    def _ensure_variables(self, example: jnp.ndarray) -> Any:
        if self._variables is None:
            self._variables = _load_default_weights("ocr_recognizer")
        if self._variables is None:
            logger.warning(
                "TextRecognizer running with randomly initialized weights"
            )
            self._variables = self.model.init(
                jax.random.PRNGKey(self._seed), example, train=False
            )
        return self._variables

    def recognize_batch(self, patches: np.ndarray) -> list[str]:
        """Recognize a [N, h, w] batch of rectified text patches.

        N is padded to the next power of two so the jitted forward compiles
        once per bucket instead of once per distinct box count per page.
        """
        patches = np.asarray(patches, dtype=np.float32)
        if patches.ndim != 3:
            raise ValueError(
                f"recognize_batch expects [N, h, w] grayscale patches, got "
                f"shape {patches.shape}"
            )
        if patches.shape[0] == 0:
            return []
        if patches.shape[2] != self.patch_width:
            raise ValueError(
                f"patch width {patches.shape[2]} != recognizer patch_width "
                f"{self.patch_width} (the positional embedding is sized for "
                "the training width)"
            )
        n = patches.shape[0]
        bucket = 1 << (n - 1).bit_length()
        if bucket > n:
            pad = np.zeros((bucket - n, *patches.shape[1:]), dtype=np.float32)
            patches = np.concatenate([patches, pad])
        batch = jnp.asarray(patches / 255.0)[..., None]
        variables = self._ensure_variables(batch)
        logits = np.asarray(self._forward(variables, batch))
        return ctc_greedy_decode(logits[:n])


class DocumentExtractor:
    """Detection -> rectification -> recognition composition
    (reference ocr.py:189-323)."""

    def __init__(
        self,
        detector: Detector | None = None,
        recognizer: Recognizer | None = None,
        patch_height: int = 32,
        patch_width: int = 256,
        pdf_dpi: int = 200,
    ) -> None:
        self.detector = detector or TextDetector()
        self.recognizer = recognizer or TextRecognizer(
            patch_height=patch_height, patch_width=patch_width
        )
        self.patch_height = patch_height
        self.patch_width = patch_width
        self.pdf_dpi = pdf_dpi
        self._page_cache: tuple[tuple[str, int], np.ndarray | None] | None = None

    def _rectify(self, image: np.ndarray, quads: np.ndarray) -> np.ndarray:
        """One fused device pass rectifies every detected box."""
        if quads.shape[0] == 0:
            return np.zeros(
                (0, self.patch_height, self.patch_width), dtype=np.float32
            )
        gray = _to_gray_f32(image)
        patches = rectify_polygons(
            jnp.asarray(gray),
            jnp.asarray(quads),
            self.patch_height,
            self.patch_width,
        )
        return np.asarray(jax.device_get(patches))

    def extract_from_image(self, image: np.ndarray) -> list[str]:
        """OCR an image into text lines (reading order)."""
        return [text for text, _ in self.extract_lines_from_image(image)]

    def extract_lines_from_image(
        self, image: np.ndarray
    ) -> list[tuple[str, np.ndarray]]:
        """OCR an image into (text, quad) pairs.

        The quad is the detector's [4, 2] (x, y) TL TR BR BL box — kept so
        layout-aware extraction (matching.fuzzy_value_extract_spatial) can
        pair a label-only line with the value printed below or beside it,
        which per-line key/value splitting cannot recover.
        """
        quads = np.asarray(self.detector.detect(image))
        patches = self._rectify(image, quads)
        texts = self.recognizer.recognize_batch(patches)
        return list(zip(texts, quads))

    def extract_from_images(
        self, images: list[np.ndarray]
    ) -> list[list[str]]:
        """OCR a batch of pages with batched device passes.

        One detector forward over all pages (``TextDetector.detect_batch``),
        per-page rectification dispatched without intermediate fetches, and
        ONE recognizer forward over every box from every page — the batched
        formulation the reference's per-box serial loop can't do
        (reference ocr.py:136-145). Falls back to per-page detect() for
        detectors without a batch entry point.
        """
        if not images:
            return []
        if hasattr(self.detector, "detect_batch"):
            page_quads = self.detector.detect_batch(images)
        else:
            page_quads = [self.detector.detect(im) for im in images]
        page_quads = [np.asarray(q).reshape(-1, 4, 2) for q in page_quads]
        counts = [q.shape[0] for q in page_quads]
        if sum(counts) == 0:
            return [[] for _ in images]
        # Round-5: ONE rectification pass for every box of every page.
        # The per-page _rectify loop paid one device dispatch + one fetch
        # per page — through a tunneled chip those round trips dominated
        # the whole OCR batch (BASELINE.md ocr breakdown). Pages stack
        # into one tall [P*H, W] image and each quad's y shifts by its
        # page offset; the homography solve maps the translated corners
        # exactly (modulo f32 rounding of the shifted fractions).
        hmax = max(im.shape[0] for im in images)
        wmax = max(im.shape[1] for im in images)
        stacked = np.zeros((len(images), hmax, wmax), dtype=np.float32)
        for i, im in enumerate(images):
            g = _to_gray_f32(im)
            stacked[i, : g.shape[0], : g.shape[1]] = g
        # Quads stay in page-LOCAL coordinates; per-quad bounds clamp to the
        # owning page's extent (an edge-hanging box replicates THAT page's
        # border like the per-page bilinear clamp did) and per-quad offsets
        # place the samples on the tall image AFTER the homography solve
        # (exact translation; tests/test_phenikaa.py pins the parity).
        all_quads = np.concatenate(page_quads).astype(np.float32)
        row_off = np.repeat(
            np.arange(len(images), dtype=np.float32) * hmax, counts
        )
        bounds = np.stack(
            [
                np.repeat(
                    np.asarray([im.shape[0] - 1 for im in images], np.float32),
                    counts,
                ),
                np.repeat(
                    np.asarray([im.shape[1] - 1 for im in images], np.float32),
                    counts,
                ),
            ],
            axis=1,
        )
        offsets = np.stack([row_off, np.zeros_like(row_off)], axis=1)
        # Pad the box count to a power of two (like recognize_batch) so the
        # jitted rectify compiles once per bucket, not once per box count.
        n = all_quads.shape[0]
        bucket = 1 << (n - 1).bit_length()
        if bucket > n:
            pad = bucket - n
            all_quads = np.concatenate(
                [all_quads, np.tile(all_quads[-1:], (pad, 1, 1))]
            )
            bounds = np.concatenate([bounds, np.tile(bounds[-1:], (pad, 1))])
            offsets = np.concatenate(
                [offsets, np.tile(offsets[-1:], (pad, 1))]
            )
        patches = np.asarray(
            rectify_polygons(
                jnp.asarray(stacked.reshape(-1, wmax)),
                jnp.asarray(all_quads),
                self.patch_height,
                self.patch_width,
                bounds=jnp.asarray(bounds),
                offsets=jnp.asarray(offsets),
            )
        )[:n]
        texts = self.recognizer.recognize_batch(patches)
        out: list[list[str]] = []
        offset = 0
        for c in counts:
            out.append(texts[offset : offset + c])
            offset += c
        return out

    def extract(self, path: Path) -> list[str]:
        """OCR a report file (PDF first page, or an image file).

        A corrupt/unreadable file returns [] with a warning (matching the
        zero-page-PDF contract): the Phenikaa corpus demonstrably contains
        corrupt inputs (PreprocessConfig.corrupted_ids) and one bad file
        must not abort an hours-long preprocess run."""
        from PIL import Image

        path = Path(path)
        try:
            if path.suffix.lower() == ".pdf":
                return self.extract_from_pdf(path)
            # convert(): palette/16-bit/LA modes would otherwise reach the
            # grayscale math as indices / out-of-range intensities.
            return self.extract_from_image(
                np.asarray(Image.open(path).convert("RGB"))
            )
        except Exception as exc:  # noqa: BLE001 — isolate bad files
            logger.warning("OCR failed for %s: %s", path, exc)
            return []

    def extract_lines(self, path: Path) -> list[tuple[str, np.ndarray]]:
        """OCR a report file into (text, quad) pairs (same file contract as
        :meth:`extract`: corrupt inputs return [] with a warning)."""
        from PIL import Image

        path = Path(path)
        try:
            if path.suffix.lower() == ".pdf":
                page = self._render_first_page(path, self.pdf_dpi)
                if page is None:
                    return []
                return self.extract_lines_from_image(page)
            return self.extract_lines_from_image(
                np.asarray(Image.open(path).convert("RGB"))
            )
        except Exception as exc:  # noqa: BLE001 — isolate bad files
            logger.warning("OCR failed for %s: %s", path, exc)
            return []

    def _render_first_page(
        self, pdf_path: Path, dpi: int
    ) -> np.ndarray | None:
        """First PDF page at ``dpi``, memoized (size 1) so the crop fast
        path and the full-page fallback don't rasterize the page twice."""
        from spine_vision_tpu.io.pdf import pdf_first_page_to_array

        key = (str(Path(pdf_path).resolve()), dpi)
        if self._page_cache is not None and self._page_cache[0] == key:
            return self._page_cache[1]
        page = pdf_first_page_to_array(pdf_path, dpi=dpi)
        self._page_cache = (key, page)
        return page

    def extract_from_pdf(self, pdf_path: Path, dpi: int | None = None) -> list[str]:
        """OCR the first page of a PDF."""
        page = self._render_first_page(pdf_path, dpi or self.pdf_dpi)
        if page is None:
            return []
        return self.extract_from_image(page)

    def extract_from_pdf_crop(
        self,
        pdf_path: Path,
        crop_region: tuple[int, int, int, int],
        dpi: int | None = None,
    ) -> list[str]:
        """OCR a fixed pixel region of a PDF's first page (fast path for
        known field positions, reference ocr.py:283-323). The crop region is
        expressed in 200-DPI pixels (DEFAULT_PDF_ID_CROP_REGION) and is
        rescaled when the page renders at a different DPI."""
        rendered_dpi = dpi or self.pdf_dpi
        page = self._render_first_page(pdf_path, rendered_dpi)
        if page is None:
            return []
        scale = rendered_dpi / 200.0
        x1, y1, x2, y2 = (int(round(c * scale)) for c in crop_region)
        region = page[y1:y2, x1:x2]
        if region.size == 0:
            return []
        return self.extract_from_image(region)
