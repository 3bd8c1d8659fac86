"""Batch-scaling sweep for the flagship ConvNeXt-base@512 train step.

The reference envelope is batch 32 (trainers/localization.py:40,65 +
trainers/base.py:95-98), but — exactly like the ResNet-18 b256 finding —
nothing says the chip is fed at b32. This sweeps the chained fwd+bwd
throughput across batch sizes for the TPU training default
(use_pallas="hybrid") to find the feed-the-chip number.

Usage: python scripts/bench_train_batch.py [batch ...]   (default 32 48 64 96)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 512
ITERS = 10


def bench(batch: int) -> float:
    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(
        backbone_name="convnext_base",
        dtype=jnp.bfloat16,
        use_pallas="hybrid" if jax.default_backend() == "tpu" else False,
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, SIZE, SIZE, 3)), jnp.bfloat16
    )

    @jax.jit
    def chained(vars_, images):
        def body(carry, _):
            def loss(q):
                out = model.apply(vars_, q, train=False)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g = jax.grad(loss)(images + carry * 1e-9)
            return jnp.sum(g).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(variables, x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best


if __name__ == "__main__":
    batches = [int(b) for b in sys.argv[1:]] or [32, 48, 64, 96]
    for b in batches:
        try:
            img_s = bench(b)
            print(f"b{b:<4d} {img_s:8.1f} img/s/chip", flush=True)
        except Exception as e:
            print(f"b{b:<4d} FAILED {str(e)[:200]}", flush=True)
