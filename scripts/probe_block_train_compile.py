"""Per-stage compile probe for the whole-block training kernel.

`tpu_compile_helper subprocess exit code 1` is a scoped-VMEM OOM with no
stage attribution (AGENTS.md); this compiles the block-train fwd+bwd for
each ConvNeXt-base@512 stage shape separately to find the offender, with
optional hc overrides.
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

B = 32
STAGES = [
    (128, 128, 128),
    (64, 64, 256),
    (32, 32, 512),
]


def main() -> None:
    if len(sys.argv) > 1:  # e.g. "512=256" to override the H chunk
        for spec in sys.argv[1:]:
            c, hc = spec.split("=")
            block_train._BWD_HCHUNK[int(c)] = int(hc)
    rng = np.random.default_rng(0)
    for h, w, c in STAGES:
        x = jnp.asarray(rng.normal(size=(B, h, w, c)) * 0.5, jnp.bfloat16)
        args = (
            x,
            jnp.asarray(rng.normal(size=(7, 7, c)) * 0.1, jnp.bfloat16),
            jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32),
            jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32),
        )

        def loss(*a):
            out = block_train.convnext_block_train(*a)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        try:
            val = float(jax.grad(loss, argnums=1)(*args).sum())
            print(
                f"stage {h}x{w}x{c} hc={block_train._BWD_HCHUNK.get(c)}: "
                f"OK ({time.time() - t0:.0f}s, dk-sum {val:.3f})",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(
                f"stage {h}x{w}x{c} hc={block_train._BWD_HCHUNK.get(c)}: "
                f"FAILED {str(exc)[:140]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
