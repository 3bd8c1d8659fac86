"""In-model ConvNeXt-base@512 b32: chained fwd and fwd+bwd for each
use_pallas config (False | "mlp" | True=megakernel).

BENCH_BATCH overrides the batch size (default 32, the reference envelope)
to probe batch-scaling headroom."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 32))
SIZE = 512
ITERS = 10


def bench(use_pallas, mode: str) -> float:
    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(
        backbone_name="convnext_base", dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, SIZE, SIZE, 3)), jnp.bfloat16
    )

    if mode == "fwd":

        @jax.jit
        def chained(vars_, images):
            def body(carry, _):
                out = model.apply(vars_, images + carry * 1e-9, train=False)
                return jnp.sum(out).astype(images.dtype), None

            final, _ = jax.lax.scan(
                body, jnp.zeros((), images.dtype), None, length=ITERS
            )
            return final

    else:

        @jax.jit
        def chained(vars_, images):
            def body(carry, _):
                def loss(q):
                    out = model.apply(vars_, q, train=False)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                g = jax.grad(loss)(images + carry * 1e-9)
                return jnp.sum(g).astype(images.dtype), None

            final, _ = jax.lax.scan(
                body, jnp.zeros((), images.dtype), None, length=ITERS
            )
            return final

    float(chained(variables, x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / ITERS
    return BATCH / per_iter


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    configs = {
        "xla": False,
        "mlp": "mlp",
        "mega": True,
        "block": "block",
        "hybrid": "hybrid",
    }
    modes = ["fwd", "fwdbwd"] if which == "all" else [which.split(":")[0]]
    sel = (
        configs
        if which == "all" or ":" not in which
        else {which.split(":")[1]: configs[which.split(":")[1]]}
    )
    for mode in modes:
        for name, flag in sel.items():
            try:
                img_s = bench(flag, mode)
                print(f"{mode:7s} use_pallas={name:5s} {img_s:8.1f} img/s/chip")
            except Exception as e:
                print(f"{mode:7s} use_pallas={name:5s} FAILED {str(e)[:150]}")
