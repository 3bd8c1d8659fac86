"""Probe 2: why do Pallas kernels stream ~3x slower than XLA elementwise?

probe_copy_bw.py showed XLA fused add at ~900 GB/s (read+write) on the
134 MB stage-1 array while BlockSpec-pipelined Pallas copies reached only
~330 GB/s. This probe isolates mechanisms, all carry-chained (out feeds
the next iteration's input — no extra XLA pass pollutes the number):

  xla_inc      carry = carry + 1 (fused single pass; the roofline anchor)
  auto_tN      BlockSpec auto-pipelined copy, tile_m = N
  wide_tN      same but array viewed as (m/8, 8c) — wider minor dim
  manual_kS    ANY->VMEM manual DMA copy, S-slot rotation (the pattern the
               dwconv/megakernel use)
  hbm_dma      one whole-array HBM->HBM async copy (raw DMA engine rate)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 200
M, C = 32 * 128 * 128, 128  # ConvNeXt-base stage 1 @ 512^2, b32: 134 MB bf16


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


def auto_copy(m, c, tile_m):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.bfloat16),
    )


def manual_copy(m, c, tile_m, slots):
    n_tiles = m // tile_m

    def kernel(x_hbm, o_hbm, buf, in_sems, out_sems):
        g = pl.program_id(0)

        def in_dma(step, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(step * tile_m, tile_m), :],
                buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(step, slot):
            return pltpu.make_async_copy(
                buf.at[slot],
                o_hbm.at[pl.ds(step * tile_m, tile_m), :],
                out_sems.at[slot],
            )

        @pl.when(g == 0)
        def _():
            in_dma(0, 0).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            in_dma(g + 1, (g + 1) % slots).start()

        in_dma(g, g % slots).wait()
        out_dma(g, g % slots).start()
        # Wait for the out DMA of the tile `slots-1` steps ago (slot reuse).
        @pl.when(g >= slots - 1)
        def _():
            out_dma(g - slots + 1, (g - slots + 1) % slots).wait()

        @pl.when(g == pl.num_programs(0) - 1)
        def _():
            out_dma(g, g % slots).wait()

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_m, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )


def hbm_dma_copy(m, c):
    def kernel(x_hbm, o_hbm, sem):
        pltpu.make_async_copy(x_hbm, o_hbm, sem).start()
        pltpu.make_async_copy(x_hbm, o_hbm, sem).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.bfloat16),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)
    bytes_moved = 2 * M * C * 2

    def report(name, fn):
        try:
            ms = timed_ms(fn, x)
            print(f"{name:16s} {ms:7.3f} ms  {bytes_moved / ms / 1e6:6.0f} GB/s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:16s} ERR {str(exc)[:120]}", flush=True)

    report("xla_inc", jax.jit(lambda q: q + jnp.bfloat16(1)))
    for tile_m in (1024, 4096, 16384):
        report(f"auto_t{tile_m}", auto_copy(M, C, tile_m))
    wide = jax.jit(
        lambda q: auto_copy(M // 8, C * 8, 4096)(q.reshape(M // 8, C * 8)).reshape(M, C)
    )
    report("wide_t4096", wide)
    for slots in (2, 3, 4):
        report(f"manual_t4096_k{slots}", manual_copy(M, C, 4096, slots))
    report("manual_t16384_k2", manual_copy(M, C, 16384, 2))
    report("hbm_dma", hbm_dma_copy(M, C))


if __name__ == "__main__":
    main()
