"""Ad-hoc timed inference over mixed image inputs (the reference's nearest
thing to ``serve()``: Model.test_inference, training/models/base.py:83-166,
generic.py:222-283, 430-492).

Functional rather than a Module method: pass the model + variables. Timing
forces the device result (``device_get``) so remote/async dispatch cannot
under-report latency.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.core.tasks import (
    TaskConfig,
    compute_predictions_for_tasks,
    compute_probabilities_for_tasks,
    get_tasks,
)
from spine_vision_tpu.models.classifier import Classifier, CoordinateRegressor
from spine_vision_tpu.ops.image import imagenet_normalize

ImageInput = Any  # str | Path | PIL.Image.Image | np.ndarray


def _to_uint8_rgb(img: ImageInput, image_size: tuple[int, int]) -> np.ndarray:
    from PIL import Image

    if isinstance(img, (str, Path)):
        pil = Image.open(img).convert("RGB")
    elif isinstance(img, np.ndarray):
        pil = Image.fromarray(img).convert("RGB")
    elif hasattr(img, "convert"):  # PIL image
        pil = img.convert("RGB")
    else:
        raise TypeError(f"Unsupported image type: {type(img)}")
    h, w = image_size
    return np.asarray(pil.resize((w, h)), dtype=np.uint8)


def _preprocess_batch(
    images: Sequence[ImageInput], image_size: tuple[int, int]
) -> tuple[np.ndarray, jax.Array]:
    stacked = np.stack([_to_uint8_rgb(img, image_size) for img in images])
    batch = imagenet_normalize(jnp.asarray(stacked, jnp.float32) / 255.0)
    return stacked, batch


def classifier_test_inference(
    model: Classifier,
    variables: Any,
    images: Sequence[ImageInput],
    image_size: tuple[int, int] = (224, 224),
    tasks: list[TaskConfig] | None = None,
) -> dict[str, Any]:
    """Timed multi-task forward over arbitrary image inputs
    (reference generic.py:222-283)."""
    tasks = tasks if tasks is not None else get_tasks()
    raw, batch = _preprocess_batch(images, image_size)

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    forward(variables, batch)  # compile outside the timed region
    start = time.perf_counter()
    logits = jax.device_get(forward(variables, batch))
    inference_time_ms = (time.perf_counter() - start) * 1000

    logits_np = {k: np.asarray(v) for k, v in logits.items()}
    return {
        "logits": logits_np,
        "predictions": compute_predictions_for_tasks(logits_np, tasks),
        "probabilities": compute_probabilities_for_tasks(logits_np, tasks),
        "images": raw,
        "inference_time_ms": inference_time_ms,
        "num_images": len(images),
        "device": str(jax.devices()[0]),
    }


def regressor_test_inference(
    model: CoordinateRegressor,
    variables: Any,
    images: Sequence[ImageInput],
    image_size: tuple[int, int] = (512, 512),
) -> dict[str, Any]:
    """Timed coordinate forward; also returns pixel coords in the resized
    frame (reference generic.py:430-492)."""
    raw, batch = _preprocess_batch(images, image_size)

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    forward(variables, batch)
    start = time.perf_counter()
    coords = np.asarray(jax.device_get(forward(variables, batch)))
    inference_time_ms = (time.perf_counter() - start) * 1000

    h, w = image_size
    pixel_coords = coords * np.asarray([w, h], dtype=np.float32)
    return {
        "coordinates": coords,
        "pixel_coordinates": pixel_coords,
        "images": raw,
        "inference_time_ms": inference_time_ms,
        "num_images": len(images),
        "device": str(jax.devices()[0]),
    }
