"""Full ResNet-18 multi-task TRAIN step (real 8-task losses + AdamW) at
large batch on the real chip — the driver-visible raw fwd+bwd number
(bench.py) omits the optimizer and real losses; this is BASELINE.json
config 1's full-step throughput half (reference envelope
trainers/classification.py:112,134, batch raised to feed the chip).

Usage: python scripts/profile_cls_train_step.py [batch ...]  (default 256 512)
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


def bench(batch: int) -> float:
    from spine_vision_tpu.core.tasks import get_tasks
    from spine_vision_tpu.models import Classifier, make_multitask_loss_fn
    from spine_vision_tpu.train.state import TrainState
    from spine_vision_tpu.train.steps import make_train_step

    tasks = get_tasks()  # all 8 registry tasks
    model = Classifier(backbone_name="resnet18", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    )
    loss_fn = make_multitask_loss_fn(tasks)
    step = make_train_step(
        model.apply,
        lambda outputs, b: loss_fn(outputs, b["targets"]),
        has_batch_stats=True,
    )
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = TrainState.create(
        params=variables["params"],
        tx=tx,
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
        "image": jnp.asarray(
            rng.normal(size=(batch, 256, 256, 3)), jnp.bfloat16
        ),
        "targets": targets,
    }

    @jax.jit
    def chained(state, b):
        def body(carry, _):
            new_state, loss = step(carry, b)
            return new_state, loss

        final, losses = jax.lax.scan(body, state, None, length=ITERS)
        return final, losses

    final, losses = chained(state, batch_dict)
    float(jnp.sum(losses))  # compile + force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        final, losses = chained(state, batch_dict)
        float(jnp.sum(losses))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [256, 512]
    for b in batches:
        try:
            print(f"b{b}: {bench(b):.1f} img/s/chip (full step: 8 tasks + AdamW)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"b{b}: FAILED {str(exc)[:160]}", flush=True)
