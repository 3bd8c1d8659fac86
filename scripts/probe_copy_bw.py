"""Probe achieved HBM streaming bandwidth for Pallas copy kernels at the
ConvNeXt-base@512 stage shapes, across tile sizes.

Motivation (AGENTS.md round-2 lore): a copy-only kernel over the C=128
stage measured 3.5 ms -> ~77 GB/s read+write, far below the chip's HBM
roofline. If that number is a tiling artifact, every "streaming-bound"
conclusion needs revisiting; this script finds the tile shape that
maximizes plain read->write streaming.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 200
B = 32
STAGES = [
    (128, 128, 128),
    (64, 64, 256),
    (32, 32, 512),
    (16, 16, 1024),
]


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def make_copy(m: int, c: int, tile_m: int):
    grid = (m // tile_m,)
    return pl.pallas_call(
        copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_m, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.bfloat16),
    )


def timed_ms(fn, x) -> float:
    @jax.jit
    def chained(x):
        def body(carry, _):
            out = fn(x + carry)
            return jnp.max(out), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None, length=ITERS)
        return final

    float(chained(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def main() -> None:
    rng = np.random.default_rng(0)
    for h, w, c in STAGES:
        m = B * h * w
        x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        bytes_moved = 2 * m * c * 2  # read + write, bf16
        line = [f"stage {h}x{w}x{c} (m={m}):"]
        for tile_m in (256, 512, 1024, 2048, 4096):
            if m % tile_m:
                continue
            try:
                ms = timed_ms(make_copy(m, c, tile_m), x)
                gbs = bytes_moved / (ms * 1e-3) / 1e9
                line.append(f"t{tile_m}={ms:.2f}ms({gbs:.0f}GB/s)")
            except Exception as exc:  # noqa: BLE001
                line.append(f"t{tile_m}=ERR:{str(exc)[:60]}")
        # XLA baseline: identity+1 copy
        ms = timed_ms(jax.jit(lambda q: q + jnp.bfloat16(1)), x)
        gbs = bytes_moved / (ms * 1e-3) / 1e9
        line.append(f"xla_add={ms:.2f}ms({gbs:.0f}GB/s)")
        print(" ".join(line), flush=True)


if __name__ == "__main__":
    main()
