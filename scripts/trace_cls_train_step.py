"""jax.profiler trace of the FULL ResNet-18 multi-task train step at b256
(real 8-task losses + AdamW + train-mode BN) and the device-op breakdown.

Round-3 measured 6140 img/s full-step vs 8651 img/s raw fwd+bwd at b256;
the raw number used eval-mode BN and input-grads, so part of the gap is
train-mode BN statistics + weight grads + optimizer. This trace attributes
the full step's device time by fusion so the gap stops being a guess.

Usage: python scripts/trace_cls_train_step.py [batch]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _trace_utils import load_device_ops, print_top_ops

import jax
import jax.numpy as jnp
import numpy as np
import optax

ITERS = 5


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from spine_vision_tpu.core.tasks import get_tasks
    from spine_vision_tpu.models import Classifier, make_multitask_loss_fn
    from spine_vision_tpu.train.state import TrainState
    from spine_vision_tpu.train.steps import make_train_step

    tasks = get_tasks()
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

        final, losses = jax.lax.scan(body, state, None, length=ITERS)
        return final, losses

    final, losses = chained(state, batch_dict)
    float(jnp.sum(losses))  # compile + force

    tmp = tempfile.mkdtemp(prefix="trace_cls_step_")
    with jax.profiler.trace(tmp):
        final, losses = chained(final, batch_dict)
        float(jnp.sum(losses))

    by_name, count, total = load_device_ops(tmp)
    print(
        f"b{batch} full train step: device-op total {total:.2f} ms over "
        f"{ITERS} iters ({total / ITERS:.2f} ms/iter, "
        f"{batch * ITERS / total * 1000:.0f} img/s device-time bound)"
    )
    print_top_ops(by_name, count, top=35)
    print("trace dir:", tmp)


if __name__ == "__main__":
    main()
