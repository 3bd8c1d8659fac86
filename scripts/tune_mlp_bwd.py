"""Tune the fused-MLP backward tile sizes at C=512 (the 27-block stage is
the single largest train-step pool: 2.20 ms/call x 27)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import spine_vision_tpu.ops.fused_mlp as fm

import sys
C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = 32
H = W = {128: 128, 256: 64, 512: 32}[C]
M = B * H * W
ITERS = 20


def bench(tm, hc):
    fm._BWD_TILE_M[C] = tm
    fm._BWD_HCHUNK[C] = hc
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.04, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(4 * C,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.01, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(C,)) * 1e-2, jnp.float32)
    g = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)

    @jax.jit
    def chained(x, g):
        def body(carry, _):
            outs = fm._mlp_bwd_pallas(
                x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, g, False
            )
            return jnp.sum(outs[0][:1, :1]).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(x, g))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x, g))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


if __name__ == "__main__":
    for tm, hc in ((256, 512), (256, 1024), (512, 256), (512, 512), (1024, 256)):
        try:
            ms = bench(tm, hc)
            print(f"tm={tm:5d} hc={hc:5d}  {ms:6.3f} ms/block", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"tm={tm:5d} hc={hc:5d}  ERR {str(exc)[:90]}", flush=True)
