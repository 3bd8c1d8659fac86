"""OCR pipeline breakdown + reference bar (round-4 verdict weak #7).

Itemizes where an ``DocumentExtractor.extract_from_images`` batch spends
its wall time on the tunneled chip:

  det_forward     detector device forward + fetch (probability maps)
  det_boxes       host box extraction from the fetched maps
  rectify_batched round-5 path: ONE rectify dispatch+fetch for all boxes
  rectify_perpage pre-round-5 path: one dispatch+fetch per page (the cost
                  the round-5 batching removed)
  rec_forward     recognizer device forward + fetch
  rec_decode      host CTC greedy decode

and measures end-to-end pages/s at several batch sizes (pad-to-max
amortization). The reference bar is a documented ESTIMATE (the reference
publishes nothing): its PaddleOCR detector is one GPU forward per page
(~50 ms at 200-DPI A4) and its VietOCR vgg_transformer recognizer runs
per box, serially, ~30 ms/box on GPU (autoregressive seq2seq decode;
reference datasets/phenikaa/ocr.py:136-145 'recognize_batch' is a python
loop) -> est pages/s = 1 / (0.05 + boxes_per_page * 0.03).

Usage: python scripts/bench_ocr_breakdown.py [n_pages...]  (default 16 32 64)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

REF_DET_S_PER_PAGE = 0.05
REF_REC_S_PER_BOX = 0.03


def make_pages(n: int) -> list[np.ndarray]:
    from spine_vision_tpu.data.phenikaa import synth

    rng = np.random.default_rng(0)
    return [
        synth.detection_page(rng, (320, 448), degrade="mild", degrade_p=0.5)[0]
        for _ in range(n)
    ]


def breakdown(extractor, pages) -> dict[str, float]:
    from spine_vision_tpu.models.textdet import extract_boxes_from_probmap
    from spine_vision_tpu.data.phenikaa.ocr import _pad_to_multiple_2d, _to_gray_f32

    det = extractor.detector
    out: dict[str, float] = {}

    # --- detector forward (device) vs box extraction (host) ---
    grays = [
        _pad_to_multiple_2d(_to_gray_f32(im) / 255.0, det.shape_bucket, value=1.0)
        for im in pages
    ]
    hmax = max(g.shape[0] for g in grays)
    wmax = max(g.shape[1] for g in grays)
    n = len(grays)
    bucket = 1 << (n - 1).bit_length()
    stacked = np.ones((bucket, hmax, wmax), dtype=np.float32)
    for i, g in enumerate(grays):
        stacked[i, : g.shape[0], : g.shape[1]] = g
    batch = jnp.asarray(stacked)[..., None]
    variables = det._ensure_variables(batch)
    probs = np.asarray(det._forward(variables, batch))  # warm/compile
    t0 = time.perf_counter()
    probs = np.asarray(det._forward(variables, batch))
    out["det_forward_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    page_quads = [
        extract_boxes_from_probmap(p[:, :, 0], threshold=det.threshold, scale=2.0)
        for p in probs[:n]
    ]
    out["det_boxes_s"] = time.perf_counter() - t0
    out["boxes_total"] = int(sum(q.shape[0] for q in page_quads))

    # --- rectification: per-page (pre-round-5) vs batched (round-5) ---
    for q, im in zip(page_quads, pages):  # warm the per-page compile
        extractor._rectify(im, np.asarray(q))
    t0 = time.perf_counter()
    patches_pp = [
        extractor._rectify(im, np.asarray(q))
        for q, im in zip(page_quads, pages)
    ]
    out["rectify_perpage_s"] = time.perf_counter() - t0

    from spine_vision_tpu.ops.warp import rectify_polygons

    def batched_rectify():
        h0 = max(im.shape[0] for im in pages)
        w0 = max(im.shape[1] for im in pages)
        stack = np.zeros((len(pages), h0, w0), dtype=np.float32)
        for i, im in enumerate(pages):
            g = _to_gray_f32(im)
            stack[i, : g.shape[0], : g.shape[1]] = g
        counts = [q.shape[0] for q in page_quads]
        quads = np.concatenate(
            [np.asarray(q).reshape(-1, 4, 2) for q in page_quads]
        ).astype(np.float32)
        offs = np.repeat(
            np.arange(len(pages), dtype=np.float32) * h0, counts
        )
        bounds = np.stack(
            [
                np.repeat(
                    np.asarray([im.shape[0] - 1 for im in pages], np.float32),
                    counts,
                ),
                np.repeat(
                    np.asarray([im.shape[1] - 1 for im in pages], np.float32),
                    counts,
                ),
            ],
            axis=1,
        )
        offsets = np.stack([offs, np.zeros_like(offs)], axis=1)
        m = quads.shape[0]
        b = 1 << (m - 1).bit_length()
        if b > m:
            quads = np.concatenate([quads, np.tile(quads[-1:], (b - m, 1, 1))])
            bounds = np.concatenate([bounds, np.tile(bounds[-1:], (b - m, 1))])
            offsets = np.concatenate(
                [offsets, np.tile(offsets[-1:], (b - m, 1))]
            )
        return np.asarray(
            rectify_polygons(
                jnp.asarray(stack.reshape(-1, w0)), jnp.asarray(quads),
                extractor.patch_height, extractor.patch_width,
                bounds=jnp.asarray(bounds), offsets=jnp.asarray(offsets),
            )
        )[:m]

    patches = batched_rectify()  # warm
    t0 = time.perf_counter()
    patches = batched_rectify()
    out["rectify_batched_s"] = time.perf_counter() - t0

    # parity evidence: batched == per-page bit-for-bit
    ref = np.concatenate([p for p in patches_pp if p.shape[0]])
    out["rectify_max_abs_delta"] = float(np.abs(patches - ref).max())

    # --- recognizer forward vs host decode ---
    from spine_vision_tpu.models.textrec import ctc_greedy_decode

    rec = extractor.recognizer
    p = np.asarray(patches, dtype=np.float32)
    m = p.shape[0]
    b = 1 << (m - 1).bit_length()
    if b > m:
        p = np.concatenate([p, np.zeros((b - m, *p.shape[1:]), np.float32)])
    rbatch = jnp.asarray(p / 255.0)[..., None]
    rvars = rec._ensure_variables(rbatch)
    logits = np.asarray(rec._forward(rvars, rbatch))  # warm
    t0 = time.perf_counter()
    logits = np.asarray(rec._forward(rvars, rbatch))
    out["rec_forward_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    ctc_greedy_decode(logits[:m])
    out["rec_decode_s"] = time.perf_counter() - t0
    return out


def e2e_pages_per_s(extractor, pages, reps: int = 4) -> float:
    out = extractor.extract_from_images(pages)  # warm + compile
    if sum(len(t) for t in out) == 0:
        raise RuntimeError("OCR produced no text")
    t0 = time.perf_counter()
    for _ in range(reps):
        extractor.extract_from_images(pages)
    return len(pages) * reps / (time.perf_counter() - t0)


def main() -> None:
    from spine_vision_tpu.data.phenikaa.ocr import DocumentExtractor

    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    extractor = DocumentExtractor()
    result: dict = {"backend": jax.default_backend()}

    pages16 = make_pages(16)
    bd = breakdown(extractor, pages16)
    result["breakdown_16pages"] = {
        k: (round(v, 4) if isinstance(v, float) else v) for k, v in bd.items()
    }
    boxes_per_page = bd["boxes_total"] / 16.0
    ref_pages_s = 1.0 / (
        REF_DET_S_PER_PAGE + boxes_per_page * REF_REC_S_PER_BOX
    )
    result["reference_serial_est_pages_s"] = round(ref_pages_s, 2)
    result["boxes_per_page"] = round(boxes_per_page, 1)

    for n in sizes:
        pages = pages16 if n == 16 else make_pages(n)
        rate = e2e_pages_per_s(extractor, pages)
        result[f"e2e_pages_per_s_n{n}"] = round(rate, 2)
        print(f"n={n}: {rate:.2f} pages/s", flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
