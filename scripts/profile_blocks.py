"""Per-stage microbenchmark of ConvNeXt block ops: fwd and fwd+bwd.

Compares, at each ConvNeXt-base stage shape (batch 32, 512^2 input):
- MLP: XLA reference vs fused Pallas forward (current bwd = XLA recompute)
- dwconv+LN: XLA vs fused Pallas forward (current bwd = XLA recompute)

Timing protocol (AGENTS.md): one jitted lax.scan chaining ITERS iterations
with a data dependency, fetched once (the tunneled chip makes per-call
dispatch dominate and block_until_ready unreliable).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.ops.dwconv import (
    depthwise_conv7x7_ln,
    depthwise_conv7x7_reference,
)
from spine_vision_tpu.ops.fused_mlp import fused_mlp, mlp_reference

ITERS = 10
B = 32
# (H, W, C, n_blocks) for ConvNeXt-base @ 512^2
STAGES = [
    (128, 128, 128, 3),
    (64, 64, 256, 3),
    (32, 32, 512, 27),
    (16, 16, 1024, 3),
]
DTYPE = jnp.bfloat16


def timed(fn, *args) -> float:
    """ms per iteration of fn chained ITERS times."""

    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(lambda q: q, a), carry)
            return out, None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def bench_mlp(h, w, c):
    m = B * h * w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)) * 0.5, DTYPE)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * (1 / np.sqrt(c)), DTYPE)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * (1 / np.sqrt(4 * c)), DTYPE)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)) * 0.5, DTYPE)

    def fwd_ref(x, w1, b1, w2, b2, gamma, res, carry):
        out = mlp_reference(x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, res)
        return jnp.sum(out[:8, :8].astype(jnp.float32))

    def fwd_pal(x, w1, b1, w2, b2, gamma, res, carry):
        out = fused_mlp(x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, res)
        return jnp.sum(out[:8, :8].astype(jnp.float32))

    def bwd_ref(x, w1, b1, w2, b2, gamma, res, carry):
        def loss(x, w1, b1, w2, b2, gamma, res):
            out = mlp_reference(x, w1, b1, w2, b2, gamma, res)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
            x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, res
        )
        return sum(jnp.sum(g[..., :1].astype(jnp.float32)) for g in grads)

    def bwd_pal(x, w1, b1, w2, b2, gamma, res, carry):
        def loss(x, w1, b1, w2, b2, gamma, res):
            out = fused_mlp(x, w1, b1, w2, b2, gamma, res)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
            x + carry.astype(x.dtype) * 1e-9, w1, b1, w2, b2, gamma, res
        )
        return sum(jnp.sum(g[..., :1].astype(jnp.float32)) for g in grads)

    args = (x, w1, b1, w2, b2, gamma, res)
    return {
        "mlp_fwd_xla": timed(fwd_ref, *args),
        "mlp_fwd_pal": timed(fwd_pal, *args),
        "mlp_fwdbwd_xla": timed(bwd_ref, *args),
        "mlp_fwdbwd_pal": timed(bwd_pal, *args),
    }


def bench_dw(h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, c)) * 0.5, DTYPE)
    k = jnp.asarray(rng.normal(size=(7, 7, c)) * 0.05, DTYPE)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    def ln(y, scale, beta):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.var(yf, axis=-1, keepdims=True)
        return ((yf - mu) * jax.lax.rsqrt(var + 1e-6) * scale + beta).astype(y.dtype)

    def fwd_xla(x, k, bias, scale, beta, carry):
        y = depthwise_conv7x7_reference(x + carry.astype(x.dtype) * 1e-9, k) + bias.astype(x.dtype)
        out = ln(y, scale, beta)
        return jnp.sum(out[:1, :8, :8, :8].astype(jnp.float32))

    def fwd_pal(x, k, bias, scale, beta, carry):
        out = depthwise_conv7x7_ln(x + carry.astype(x.dtype) * 1e-9, k, bias, scale, beta)
        return jnp.sum(out[:1, :8, :8, :8].astype(jnp.float32))

    def bwd_xla(x, k, bias, scale, beta, carry):
        def loss(x, k, bias, scale, beta):
            y = depthwise_conv7x7_reference(x, k) + bias.astype(x.dtype)
            return jnp.sum(ln(y, scale, beta).astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x + carry.astype(x.dtype) * 1e-9, k, bias, scale, beta
        )
        return sum(jnp.sum(g[..., :1].astype(jnp.float32)) for g in grads)

    def bwd_pal(x, k, bias, scale, beta, carry):
        def loss(x, k, bias, scale, beta):
            return jnp.sum(
                depthwise_conv7x7_ln(x, k, bias, scale, beta).astype(jnp.float32) ** 2
            )

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x + carry.astype(x.dtype) * 1e-9, k, bias, scale, beta
        )
        return sum(jnp.sum(g[..., :1].astype(jnp.float32)) for g in grads)

    args = (x, k, bias, scale, beta)
    return {
        "dw_fwd_xla": timed(fwd_xla, *args),
        "dw_fwd_pal": timed(fwd_pal, *args),
        "dw_fwdbwd_xla": timed(bwd_xla, *args),
        "dw_fwdbwd_pal": timed(bwd_pal, *args),
    }


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    totals: dict[str, float] = {}
    for h, w, c, nblocks in STAGES:
        row = {}
        if which in ("all", "mlp"):
            row.update(bench_mlp(h, w, c))
        if which in ("all", "dw"):
            row.update(bench_dw(h, w, c))
        print(f"stage C={c:4d} ({h}x{w}, {nblocks} blocks):")
        for name, ms in row.items():
            print(f"  {name:16s} {ms:7.2f} ms/block   {ms * nblocks:7.1f} ms total")
            totals[name] = totals.get(name, 0.0) + ms * nblocks
    print("TOTALS over all blocks:")
    for name, ms in totals.items():
        print(f"  {name:16s} {ms:7.1f} ms")
