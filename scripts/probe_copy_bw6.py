"""Probe 6: is the ~273-283 GB/s bidirectional Pallas streaming cap
per-KERNEL or per-CHIP?

probe5 established: reads alone ~438 GB/s, writes alone ~398 GB/s, any
single Pallas kernel doing read+write ~273-283 GB/s aggregate, XLA's fused
elementwise ~500.  VERDICT round-3 item 6 asks for one bounded follow-up:
if the cap is per-kernel scheduling (not a shared engine), TWO independent
copy kernels in flight in one XLA program should aggregate >283 GB/s, and
splitting each ConvNeXt block kernel into two half-H kernels would overlap
one kernel's writes with the other's reads.

Variants (all on two disjoint 67 MB payloads, total 134 MB read + 134 MB
written per iteration):

  one_kernel      both payloads copied inside ONE pallas_call (baseline —
                  should land at the known ~273-283).
  two_kernels     two independent pallas_call copies in one jit; XLA may
                  run them concurrently (no data dependence).
  interleaved     two pallas_calls with a chain dependence (token from the
                  first mixed into the second) — serialization control.
  xla_two         two independent XLA elementwise increments (anchor).

Interpretation: two_kernels >> one_kernel => per-kernel cap, pursue the
split-kernel overlap in ops/convnext_block.py.  two_kernels ~= one_kernel
=> shared-engine cap, retire VERDICT item 6 with this probe as evidence.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 100
M, C = 16 * 128 * 128, 128  # 67 MB bf16 per payload
SIZE_BYTES = M * C * 2
TILE_M = 2048


def timed_ms(fn, *args) -> float:
    @jax.jit
    def chained(*xs):
        def body(carry, _):
            return fn(*carry), None

        final, _ = jax.lax.scan(body, xs, None, length=ITERS)
        return sum(jnp.max(f) for f in final)

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.bfloat16(1.0)


def _copy_call(x):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // TILE_M,),
        in_specs=[pl.BlockSpec((TILE_M, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TILE_M, C), lambda i: (i, 0)),
    )(x)


def one_kernel(a, b):
    ab = jnp.concatenate([a, b], axis=0)
    out = _copy_call(ab)
    return out[:M], out[M:]


def two_kernels(a, b):
    return _copy_call(a), _copy_call(b)


def interleaved(a, b):
    a2 = _copy_call(a)
    # data dependence: forces the second kernel after the first
    b2 = _copy_call(b + a2[:1, :1].astype(jnp.bfloat16) * 0)
    return a2, b2


def xla_two(a, b):
    return a + jnp.bfloat16(1.0), b + jnp.bfloat16(1.0)


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)
    total = 2 * 2 * SIZE_BYTES  # read+write of both payloads
    for name, fn in (
        ("one_kernel", one_kernel),
        ("two_kernels", two_kernels),
        ("interleaved", interleaved),
        ("xla_two", xla_two),
    ):
        try:
            ms = timed_ms(fn, a, b)
            gbs = total / (ms / 1000.0) / 1e9
            print(f"{name:14s} {ms:7.3f} ms  {gbs:7.1f} GB/s aggregate", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:14s} FAILED {str(exc)[:140]}", flush=True)


if __name__ == "__main__":
    main()
