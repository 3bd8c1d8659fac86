"""Per-stage fwd+bwd bench: whole-block training kernel vs the round-2
composition (XLA grouped dwconv + LN-fused Pallas MLP).

Usage: python scripts/bench_block_train.py [stage_c ...] [c=hc or c=hc/th ...]
e.g. `512 512=256/4` benches only the C=512 stage with hc=256, th=4.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.ops import block_train
from spine_vision_tpu.ops.fused_mlp import fused_ln_mlp

B = 32
ITERS = 20
STAGES = {
    128: (128, 128),
    256: (64, 64),
    512: (32, 32),
}


def dwconv_xla(x, k, bias):
    c = x.shape[-1]
    return (
        jax.lax.conv_general_dilated(
            x,
            k.reshape(7, 7, 1, c).astype(x.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        + bias.astype(x.dtype)
    )


def timed_grad_ms(fn, args) -> float:
    grad_fn = jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2))

    @jax.jit
    def chained(*a):
        def body(carry, _):
            g = grad_fn(a[0] + carry * 1e-9, *a[1:])
            return jnp.sum(g).astype(jnp.float32), None

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
    only = []
    for a in sys.argv[1:]:
        if "=" in a:
            c, rest = a.split("=")
            if "/" in rest:
                hc, th = rest.split("/")
                block_train._BWD_TILE_H[int(c)] = int(th)
            else:
                hc = rest
            block_train._BWD_HCHUNK[int(c)] = int(hc)
        else:
            only.append(int(a))
    rng = np.random.default_rng(0)
    for c, (h, w) in STAGES.items():
        if only and c not in only:
            continue
        x = jnp.asarray(rng.normal(size=(B, h, w, c)) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, c)) * 0.1, jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        ls = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
        lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.bfloat16)
        b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
        args = (x, k, bias, ls, lb, w1, b1, w2, b2, gamma)

        def composed(x, k, bias, ls, lb, w1, b1, w2, b2, gamma):
            u = dwconv_xla(x, k, bias)
            m = u.shape[0] * u.shape[1] * u.shape[2]
            out = fused_ln_mlp(
                u.reshape(m, c), ls, lb, w1, b1, w2, b2, gamma,
                x.reshape(m, c),
            )
            return out

        for name, fn in (
            ("block", block_train.convnext_block_train),
            ("hybrid", block_train.convnext_block_hybrid),
            ("composed", composed),
        ):
            try:
                ms = timed_grad_ms(fn, args)
                cfg = (
                    f"hc={block_train._BWD_HCHUNK.get(c)},"
                    f"th={block_train._BWD_TILE_H.get(c)}"
                    if name == "block"
                    else ""
                )
                print(f"C={c} {name:9s} {ms:7.2f} ms/iter {cfg}", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"C={c} {name:9s} FAILED {str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
