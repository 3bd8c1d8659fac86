"""PDF rasterization (capability parity with reference io/pdf.py:10-84).

PyMuPDF is not bundled in this environment, so rendering is backend-gated:
``pymupdf``/``fitz`` is used when importable, otherwise a clear ImportError
explains the gap (pure host I/O — there is no device math to move to TPU,
SURVEY.md §2.2).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _get_fitz():
    try:
        import fitz  # type: ignore

        return fitz
    except ImportError:
        try:
            import pymupdf as fitz  # type: ignore

            return fitz
        except ImportError as exc:
            raise ImportError(
                "PDF rendering requires PyMuPDF (pymupdf). Install it or "
                "pre-rasterize reports to PNG and use the image path instead."
            ) from exc


def pdf_to_arrays(pdf_path: Path, dpi: int = 200) -> list[np.ndarray]:
    """Render every page of a PDF to an RGB uint8 array at the given DPI."""
    fitz = _get_fitz()
    zoom = dpi / 72.0
    matrix = fitz.Matrix(zoom, zoom)
    arrays: list[np.ndarray] = []
    with fitz.open(str(pdf_path)) as doc:
        for page in doc:
            pix = page.get_pixmap(matrix=matrix)
            arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
                pix.height, pix.width, pix.n
            )
            arrays.append(arr[..., :3].copy())
    return arrays


def pdf_first_page_to_array(pdf_path: Path, dpi: int = 200) -> np.ndarray | None:
    """Render only the first page (fast path for report headers)."""
    fitz = _get_fitz()
    zoom = dpi / 72.0
    matrix = fitz.Matrix(zoom, zoom)
    with fitz.open(str(pdf_path)) as doc:
        if doc.page_count == 0:
            return None
        pix = doc[0].get_pixmap(matrix=matrix)
        arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
            pix.height, pix.width, pix.n
        )
        return arr[..., :3].copy()


def pdf_to_images(pdf_path: Path, output_dir: Path, dpi: int = 200) -> list[Path]:
    """Render a PDF to numbered PNG files in ``output_dir``."""
    from PIL import Image

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    paths: list[Path] = []
    for i, arr in enumerate(pdf_to_arrays(pdf_path, dpi=dpi)):
        out = output_dir / f"{Path(pdf_path).stem}_page{i + 1}.png"
        Image.fromarray(arr).save(out)
        paths.append(out)
    return paths
