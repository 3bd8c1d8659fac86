"""Probe 3: is the ~283 GB/s Pallas streaming ceiling a dtype/layout
artifact? Same 134 MB payload viewed as different dtypes/minor dims.
All carry-chained (copy output feeds next input)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 200
BYTES = 32 * 128 * 128 * 128 * 2  # 134 MB


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


def auto_copy(m, c, tile_m, dtype):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), dtype),
    )


def main() -> None:
    rng = np.random.default_rng(0)

    def report(name, fn, x):
        try:
            ms = timed_ms(fn, x)
            print(f"{name:22s} {ms:7.3f} ms  {2 * BYTES / ms / 1e6:6.0f} GB/s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:22s} ERR {str(exc)[:100]}", flush=True)

    x16 = jnp.asarray(rng.normal(size=(BYTES // 2,)), jnp.bfloat16)
    x32 = jnp.asarray(rng.normal(size=(BYTES // 4,)), jnp.float32)
    x8 = jnp.asarray(rng.integers(0, 127, size=(BYTES,)), jnp.int8)

    report("xla_inc_bf16", jax.jit(lambda q: q + jnp.bfloat16(1)), x16)
    for c in (128, 256, 512, 1024):
        m = BYTES // 2 // c
        report(
            f"bf16_c{c}",
            jax.jit(lambda q, m=m, c=c: auto_copy(m, c, 1024, jnp.bfloat16)(q.reshape(m, c)).reshape(-1)),
            x16,
        )
    for c in (128, 512):
        m = BYTES // 4 // c
        report(
            f"f32_c{c}",
            jax.jit(lambda q, m=m, c=c: auto_copy(m, c, 1024, jnp.float32)(q.reshape(m, c)).reshape(-1)),
            x32,
        )
    m = BYTES // 256
    report(
        "int8_c256",
        jax.jit(lambda q, m=m: auto_copy(m, 256, 1024, jnp.int8)(q.reshape(m, 256)).reshape(-1)),
        x8,
    )


if __name__ == "__main__":
    main()
