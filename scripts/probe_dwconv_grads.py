"""Split XLA depthwise-conv7x7 train cost into fwd / d_input / d_weight at
each ConvNeXt-base@512 stage shape (batch 32). Identifies whether a
targeted Pallas weight-grad kernel is worth writing.

KNOWN LIMITATION: the isolated d_weight grad lowers to a conv with
batch_group_count, which the remote compiler rejects ("Expected output
feature dimension size (value 1) to be a multiple of batch group count") —
fwd and dx measure fine, dw crashes. Inside the full model XLA takes a
different path and compiles; use scripts/trace_train_step.py to read the
in-model dwconv costs instead (end-of-round-2: ~1.3 ms per stage-1 conv
pass, no pathological fusion left)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30
B = 32
STAGES = [
    (128, 128, 128, 3),
    (64, 64, 256, 3),
    (32, 32, 512, 27),
    (16, 16, 1024, 3),
]
DTYPE = jnp.bfloat16


def dwconv(x, w):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def timed(fn, *args) -> float:
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 1e-9, *a[1:])
            return jnp.sum(out[..., :1].astype(jnp.float32)), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def main() -> None:
    rng = np.random.default_rng(0)
    for h, w, c, nblocks in STAGES:
        x = jnp.asarray(rng.normal(size=(B, h, w, c)) * 0.5, DTYPE)
        k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, DTYPE)

        fwd = timed(lambda q, kk: dwconv(q, kk), x, k)

        def dx_fn(q, kk):
            return jax.grad(
                lambda xx: jnp.sum(dwconv(xx, kk).astype(jnp.float32) ** 2)
            )(q)

        def dw_fn(q, kk):
            return jax.grad(
                lambda ww: jnp.sum(dwconv(q, ww).astype(jnp.float32) ** 2)
            )(kk)

        dx = timed(dx_fn, x, k)
        dw = timed(dw_fn, x, k)
        print(
            f"stage {h}x{w}x{c}: fwd {fwd:6.2f} ms  dx {dx:6.2f} ms  "
            f"dw {dw:6.2f} ms   (x{nblocks} blocks -> "
            f"fwd {fwd * nblocks:5.1f} dx {dx * nblocks:5.1f} dw {dw * nblocks:5.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
