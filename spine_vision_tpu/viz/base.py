"""Visualization primitives: figure saving, colors, prediction decoding.

Capability parity with reference visualization/base.py:19-220. Matplotlib
runs headless (Agg); ``save_figure`` supports 'image' (PNG), 'html'
(PNG + minimal HTML wrapper) and 'browser' (best-effort open) output modes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Sequence

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

# Confusion category colors (parity with reference color constants).
CONFUSION_COLORS = {
    "TP": "#2ca02c",
    "TN": "#1f77b4",
    "FP": "#d62728",
    "FN": "#ff7f0e",
}

SPLIT_COLORS = {
    "train": "#1f77b4",
    "val": "#ff7f0e",
    "test": "#2ca02c",
}


def extract_prediction_value(pred: np.ndarray | float | int) -> int:
    """Decode a prediction array to a class index.

    Binary probabilities ([1] or scalar in [0,1]) threshold at 0.5;
    multiclass probability vectors argmax (reference base.py:43-74).
    """
    arr = np.asarray(pred)
    if arr.ndim == 0:
        value = float(arr)
        return int(value > 0.5) if 0.0 <= value <= 1.0 else int(value)
    arr = arr.reshape(-1)
    if arr.size == 1:
        value = float(arr[0])
        return int(value > 0.5) if 0.0 <= value <= 1.0 else int(value)
    return int(np.argmax(arr))


def save_figure(
    fig: "plt.Figure",
    output_path: Path,
    filename: str,
    output_mode: str = "image",
    dpi: int = 100,
) -> Path:
    """Save a figure per the output mode and close it.

    Returns the saved image path.
    """
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    image_path = output_path / f"{filename}.png"
    fig.savefig(image_path, dpi=dpi, bbox_inches="tight")

    if output_mode in ("html", "browser"):
        html_path = output_path / f"{filename}.html"
        html_path.write_text(
            f"<html><body><img src='{image_path.name}'/></body></html>"
        )
        if output_mode == "browser":  # pragma: no cover - interactive only
            import webbrowser

            webbrowser.open(html_path.as_uri())

    plt.close(fig)
    return image_path


def to_display_image(image: np.ndarray) -> np.ndarray:
    """Convert any image array to displayable HWC uint8."""
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[0] < arr.shape[-1]:
        arr = np.transpose(arr, (1, 2, 0))
    if arr.dtype != np.uint8:
        amin, amax = float(arr.min()), float(arr.max())
        if amax > amin:
            arr = (arr - amin) / (amax - amin) * 255.0
        arr = arr.astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return arr


def make_image_grid(
    images: Sequence[np.ndarray],
    titles: Sequence[str] | None = None,
    cols: int = 4,
    cell_size: float = 3.0,
) -> "plt.Figure":
    """Lay out images on a grid of axes (reference base.py:196-220)."""
    n = len(images)
    cols = max(1, min(cols, n))
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(cols * cell_size, rows * cell_size))
    axes = np.atleast_1d(axes).reshape(-1)
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(to_display_image(images[i]), cmap="gray")
            if titles is not None and i < len(titles):
                ax.set_title(str(titles[i]), fontsize=8)
    return fig


def load_classification_original_images(
    data_path: Path,
    metadata_list: list[dict[str, Any]],
    output_size: tuple[int, int] = (256, 256),
) -> list[np.ndarray]:
    """Reconstruct [T2, T1, T2] display images from metadata
    (reference base.py:104-186)."""
    import cv2

    from spine_vision_tpu.data.datasets import construct_3channel

    images: list[np.ndarray] = []
    data_path = Path(data_path)
    for meta in metadata_list:
        source = meta.get("source", "")
        patient = meta.get("patient_id", "")
        ivd = meta.get("ivd", "")
        t1 = data_path / "images" / f"{source}_{patient}_sag_t1_L{ivd}.png"
        t2 = data_path / "images" / f"{source}_{patient}_sag_t2_L{ivd}.png"
        t1_arr = cv2.imread(str(t1), cv2.IMREAD_GRAYSCALE) if t1.exists() else None
        t2_arr = cv2.imread(str(t2), cv2.IMREAD_GRAYSCALE) if t2.exists() else None
        if t1_arr is None and t2_arr is None:
            images.append(np.zeros((*output_size, 3), dtype=np.uint8))
            continue
        rgb = construct_3channel(t2_arr, t1_arr)
        h, w = output_size
        images.append(cv2.resize(rgb, (w, h), interpolation=cv2.INTER_LINEAR))
    return images
