"""On-chip bisect of the round-4 ResNet BN/pool change (VERDICT r4 item 1).

Round 4 swapped nn.BatchNorm -> TpuBatchNorm and nn.max_pool -> the
scatter-free pool (commit a5bda79) and never re-measured the benched
path; the round-4 driver bench then read resnet18_cls_fwdbwd_b256_img_s
= 1884.8 against BASELINE.md's 8651.8 round-3 claim. This script
measures all four (norm_impl, pool_impl) combos with BOTH harnesses in
ONE tunnel session so the numbers are directly comparable:

  raw:  the round-3/4 bench.py definition (eval-mode BN, grad w.r.t.
        images, synthetic sum-of-squares loss) — connects to both the
        8651.8 and 1884.8 historical numbers;
  full: the REAL train step (train-mode BN, params grads, real 8-task
        losses + AdamW) — the definition bench.py carries from round 5 on.

Usage: python scripts/bisect_resnet_bn_pool.py [batch]   (default 256)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

ITERS = 10


def _build(norm_impl: str, pool_impl: str):
    from spine_vision_tpu.models import Classifier

    model = Classifier(
        backbone_name="resnet18",
        dtype=jnp.bfloat16,
        norm_impl=norm_impl,
        pool_impl=pool_impl,
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    )
    return model, variables


def bench_raw(model, variables, batch: int) -> float:
    """The round-3/4 bench.py harness, verbatim semantics."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 256, 256, 3)), jnp.bfloat16
    )

    @jax.jit
    def chained(vars_, images):
        def body(carry, _):
            def loss(q):
                out = model.apply(vars_, q, train=False)
                return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in out.values())

            g = jax.grad(loss)(images + carry * 1e-9)
            return jnp.sum(g).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return final

    float(chained(variables, x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best


def bench_full(model, variables, batch: int) -> float:
    """Real train step: train-mode BN, params grads, 8 tasks + AdamW."""
    from spine_vision_tpu.core.tasks import get_tasks
    from spine_vision_tpu.models import make_multitask_loss_fn
    from spine_vision_tpu.train.state import TrainState
    from spine_vision_tpu.train.steps import make_train_step

    tasks = get_tasks()
    loss_fn = make_multitask_loss_fn(tasks)
    step = make_train_step(
        model.apply,
        lambda outputs, b: loss_fn(outputs, b["targets"]),
        has_batch_stats=True,
    )
    state = TrainState.create(
        params=variables["params"],
        tx=optax.adamw(1e-3, weight_decay=1e-4),
        batch_stats=variables.get("batch_stats"),
        seed=1,
    )
    rng = np.random.default_rng(0)
    targets = {}
    for t in tasks:
        if t.num_classes > 1:
            targets[t.name] = jnp.asarray(
                rng.integers(0, t.num_classes, size=(batch,)), jnp.int32
            )
        else:
            targets[t.name] = jnp.asarray(
                rng.integers(0, 2, size=(batch, 1)).astype(np.float32)
            )
    batch_dict = {
        "image": jnp.asarray(rng.normal(size=(batch, 256, 256, 3)), jnp.bfloat16),
        "targets": targets,
    }

    @jax.jit
    def chained(state, b):
        def body(carry, _):
            new_state, loss = step(carry, b)
            return new_state, loss

        return jax.lax.scan(body, state, None, length=ITERS)

    _, losses = chained(state, batch_dict)
    float(jnp.sum(losses))  # compile + force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, losses = chained(state, batch_dict)
        float(jnp.sum(losses))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"backend={jax.default_backend()} batch={batch}", flush=True)
    combos = [
        ("tpu", "tpu"),  # round-4 shipped state
        ("flax", "tpu"),
        ("tpu", "flax"),
        ("flax", "flax"),  # round-3 state
    ]
    if len(sys.argv) > 2:  # e.g. "tpu:tpu,tpu:flax"
        combos = [tuple(c.split(":")) for c in sys.argv[2].split(",")]
    for norm_impl, pool_impl in combos:
        model, variables = _build(norm_impl, pool_impl)
        try:
            raw = bench_raw(model, variables, batch)
            print(f"norm={norm_impl:4s} pool={pool_impl:4s} raw  {raw:8.1f} img/s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"norm={norm_impl:4s} pool={pool_impl:4s} raw  FAILED {str(exc)[:160]}", flush=True)
        try:
            full = bench_full(model, variables, batch)
            print(f"norm={norm_impl:4s} pool={pool_impl:4s} full {full:8.1f} img/s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"norm={norm_impl:4s} pool={pool_impl:4s} full FAILED {str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
