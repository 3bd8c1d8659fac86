"""Ablate the fused-MLP kernel: where does the time go at C=128?

Variants: full (erf-gelu f32), relu activation, bf16 gelu, matmuls-only,
copy-only (grid-step overhead floor), at several tile_m values.
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 10
B = 32


def timed(fn, *args) -> float:
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return out, None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def _erf_gelu(x):
    z = x * (1.0 / math.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def make_kernel(variant):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, res_ref, out_ref):
        x = x_ref[:]
        if variant == "copy":
            out_ref[:] = x + res_ref[:]
            return
        h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        h = h + b1_ref[0, :].astype(jnp.float32)
        if variant == "full":
            h = _erf_gelu(h).astype(x.dtype)
        elif variant == "relu":
            h = jnp.maximum(h, 0.0).astype(x.dtype)
        elif variant == "gelu_bf16":
            h = _erf_gelu(h.astype(x.dtype))
        elif variant == "matmul_only":
            h = h.astype(x.dtype)
        out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        out = out + b2_ref[0, :].astype(jnp.float32)
        out = out * gamma_ref[0, :].astype(jnp.float32)
        out = out + res_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def run(variant, m, c, tile_m):
    h = 4 * c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, h)) * (1 / np.sqrt(c)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(1, h)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * (1 / np.sqrt(h)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(1, c)) * 0.01, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(1, c)) * 1e-2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.bfloat16)

    tm = tile_m
    num_tiles = m // tm
    tok_spec = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    fix = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        make_kernel(variant),
        grid=(num_tiles,),
        in_specs=[
            tok_spec, fix((c, h)), fix((1, h)), fix((h, c)), fix((1, c)),
            fix((1, c)), tok_spec,
        ],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
    )

    def f(x, w1, b1, w2, b2, gamma, res, carry):
        out = call(x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, res)
        return jnp.sum(out[:8, :8].astype(jnp.float32))

    ms = timed(f, x, w1, b1, w2, b2, gamma, res)
    flops = 2 * 2 * m * c * h
    print(
        f"C={c} tm={tm:5d} {variant:12s} {ms:7.2f} ms  "
        f"{flops / ms / 1e9:6.1f} TFLOP/s  ({num_tiles} steps)"
    )


if __name__ == "__main__":
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    m = B * {128: 128 * 128, 256: 64 * 64, 512: 32 * 32}[c]
    for tm in (1024, 2048, 4096):
        for variant in ("copy", "matmul_only", "relu", "gelu_bf16", "full"):
            try:
                run(variant, m, c, tm)
            except Exception as e:
                print(f"C={c} tm={tm} {variant}: FAILED {str(e)[:120]}")
