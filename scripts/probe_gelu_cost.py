"""How expensive is the in-kernel rational-erf GELU on the VPU at the
stage-1 hidden shape? Times Pallas kernels over [M, 512] f32 tiles doing
(a) copy, (b) gelu, (c) gelu+grad — the gap bounds what the fused-MLP
kernels spend on activation math at C=128 (hidden 4C=512, M=524288)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import sys
sys.path.insert(0, ".")
from spine_vision_tpu.ops.fused_mlp import _erf_gelu, _gelu_and_grad

ITERS = 100
M, C = 32 * 128 * 128, 512  # stage-1 hidden


def timed_ms(fn, x) -> float:
    @jax.jit
    def chained(x0):
        def body(carry, _):
            return fn(carry), None

        final, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.max(final)

    float(chained(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def make(body_fn):
    def kernel(x_ref, o_ref):
        o_ref[...] = body_fn(x_ref[...]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(M // 512,),
        in_specs=[pl.BlockSpec((512, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((512, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
    )


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)
    for name, fn in (
        ("copy", lambda q: q),
        ("gelu", lambda q: _erf_gelu(q.astype(jnp.float32))),
        ("gelu+grad", lambda q: sum(_gelu_and_grad(q.astype(jnp.float32)))),
        ("tanh_gelu", lambda q: jax.nn.gelu(q.astype(jnp.float32), approximate=True)),
    ):
        ms = timed_ms(make(fn), x)
        print(f"{name:10s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
