"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec/chip for the flagship
ConvNeXt-base 512x512 localization forward (reference default envelope:
ConvNeXt-base @ 512^2, batch 32, fp16, single CUDA GPU —
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


def main() -> None:
    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(backbone_name="convnext_base", dtype=jnp.bfloat16)
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
    main()
