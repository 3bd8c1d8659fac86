"""Does per-block remat help the streaming-bound train step?

Wraps ConvNeXtBlock in nn.remat (nothing_saveable) so the backward
recomputes each block's forward instead of loading saved intermediates
from HBM.
"""

from __future__ import annotations

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import spine_vision_tpu.models.convnext as cx

BATCH = 32
SIZE = 512
ITERS = 10


def bench(use_pallas):
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

    @jax.jit
    def chained(vars_, images):
        def body(carry, _):
            def loss(q):
                out = model.apply(vars_, q, train=False)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g = jax.grad(loss)(images + carry * 1e-9)
            return jnp.sum(g).astype(images.dtype), None

        final, _ = jax.lax.scan(body, jnp.zeros((), images.dtype), None, length=ITERS)
        return final

    float(chained(variables, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    return BATCH * ITERS / best


if __name__ == "__main__":
    policy = sys.argv[1] if len(sys.argv) > 1 else "nothing"
    policies = {
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "dots": jax.checkpoint_policies.dots_saveable,
    }
    cx.ConvNeXtBlock = nn.remat(
        cx.ConvNeXtBlock, policy=policies[policy], static_argnums=()
    )
    img_s = bench("mlp")
    print(f"fwdbwd remat={policy} use_pallas=mlp {img_s:8.1f} img/s/chip")
