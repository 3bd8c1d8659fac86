"""Capture a jax.profiler trace of the ConvNeXt-base@512 b32 fwd+bwd step
and print the device-op time breakdown (aggregated by op name).

Usage: python scripts/trace_train_step.py [xla|mlp|mega|block|hybrid] [fwd|fwdbwd]

The axon tunnel supports profiling (verified: device plane with per-fusion
timings lands in vm.trace.json.gz); this replaces blind ablation as the
way to find train-step hotspots.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _trace_utils import load_device_ops

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 32
SIZE = 512
ITERS = 3


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "mlp"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwdbwd"
    use_pallas = {"xla": False, "mlp": "mlp", "mega": True, "block": "block", "hybrid": "hybrid"}[which]

    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(
        backbone_name="convnext_base", dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, SIZE, SIZE, 3)), jnp.bfloat16
    )

    if mode == "fwd":

        @jax.jit
        def chained(vars_, images):
            def body(carry, _):
                out = model.apply(vars_, images + carry * 1e-9, train=False)
                return jnp.sum(out).astype(images.dtype), None

            final, _ = jax.lax.scan(body, jnp.zeros((), images.dtype), None, length=ITERS)
            return final

    else:

        @jax.jit
        def chained(vars_, images):
            def body(carry, _):
                def loss(q):
                    out = model.apply(vars_, q, train=False)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                g = jax.grad(loss)(images + carry * 1e-9)
                return jnp.sum(g).astype(images.dtype), None

            final, _ = jax.lax.scan(body, jnp.zeros((), images.dtype), None, length=ITERS)
            return final

    float(chained(variables, x))  # compile + warm

    tmp = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(tmp):
        float(chained(variables, x))

    by_name, count, total = load_device_ops(tmp)
    per_iter = total / ITERS
    print(f"config={which} mode={mode} device-op total {total:.1f} ms "
          f"({per_iter:.1f} ms/iter, {BATCH / per_iter * 1000:.1f} img/s)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{dur / ITERS:9.3f} ms/iter  x{count[name] // ITERS:3d}  {name[:90]}")
    print("trace dir:", tmp)


if __name__ == "__main__":
    main()
