"""Real 2-process distributed worker (launched by tests/test_multiprocess.py).

Reference equivalent: accelerate-launched multi-GPU training with
cross-process gather and main-process gating
(/root/reference/spine_vision/training/trainers/base.py:229-266, 626-628).

This worker executes the framework's actual multi-host pieces with NO fakes:
``jax.distributed.initialize`` over a TCP coordinator, the real
:class:`DataLoader` process slicing, ``shard_batch``'s
``make_array_from_process_local_data`` global-batch assembly, XLA-inserted
cross-process gradient/BatchNorm collectives, a ``process_allgather`` eval
fetch, and a collective orbax checkpoint save.

The training math is shared with the single-process parity run via
``run_training`` so the parent test can compare final params exactly.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

N_STEPS = 2
GLOBAL_BATCH = 8
IMG = 32
N_SAMPLES = 32
LOADER_SEED = 42
INIT_SEED = 7


class SynthCoordDataset:
    """Deterministic per-index synthetic localization samples."""

    def __len__(self) -> int:
        return N_SAMPLES

    def __getitem__(self, i: int) -> dict:
        rng = np.random.default_rng(1000 + i)
        return {
            "image": rng.normal(size=(IMG, IMG, 3)).astype(np.float32),
            "coords": rng.uniform(size=(5, 2)).astype(np.float32),
            "mask": np.ones((5,), np.float32),
        }


def build_template_model():
    """The model under test (shared with the parent test's restore check)."""
    import jax.numpy as jnp

    from spine_vision_tpu.models import CoordinateRegressor

    return CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)


def run_training(outdir: Path, tag: str) -> dict:
    """Run N_STEPS of real DP training over the seeded loader stream.

    Identical math whether jax.process_count() is 1 or >1: the loader draws
    the same seeded global index stream and the mesh spans all devices, so
    final (replicated) params must match bit-for-tolerance across layouts.

    Writes ``{tag}_params.npz``, ``{tag}_eval.npy``, ``{tag}_summary.json``
    into outdir (process 0 only) and saves an orbax checkpoint collectively
    at ``outdir / f"{tag}_ckpt"``.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from spine_vision_tpu.data.loader import DataLoader
    from spine_vision_tpu.models import make_coordinate_loss_fn
    from spine_vision_tpu.parallel import make_mesh
    from spine_vision_tpu.parallel.mesh import all_gather_host
    from spine_vision_tpu.train.checkpoint import save_checkpoint
    from spine_vision_tpu.train.state import TrainState
    from spine_vision_tpu.train.steps import make_train_step

    model = build_template_model()
    variables = model.init(
        jax.random.PRNGKey(INIT_SEED), np.zeros((1, IMG, IMG, 3), np.float32),
        train=False,
    )
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    coord_loss = make_coordinate_loss_fn("smooth_l1")

    def loss_fn(outputs, batch):
        return coord_loss(outputs, batch["coords"], batch["mask"])

    step = make_train_step(model.apply, loss_fn, has_batch_stats=True)

    ctx = make_mesh()  # all devices, all processes
    state = TrainState.create(
        params=ctx.replicate(variables["params"]),
        tx=optax.adamw(1e-3),
        batch_stats=ctx.replicate(variables["batch_stats"]),
    )

    # Real loader: every process draws the same global index stream and takes
    # its contiguous per-host slice of each global batch.
    loader = DataLoader(
        SynthCoordDataset(),
        batch_size=GLOBAL_BATCH,
        shuffle=True,
        seed=LOADER_SEED,
        num_workers=2,
    )
    losses = []
    it = iter(loader)
    for _ in range(N_STEPS):
        local = next(it)
        device_batch = ctx.shard_batch(local)
        state, loss = step(state, device_batch)
        losses.append(float(jax.device_get(loss)))

    # Eval forward + cross-process gather (reference: accelerator.gather).
    eval_local_idx = range(
        jax.process_index() * (GLOBAL_BATCH // jax.process_count()),
        (jax.process_index() + 1) * (GLOBAL_BATCH // jax.process_count()),
    )
    ds = SynthCoordDataset()
    eval_local = {
        "image": np.stack([ds[i]["image"] for i in eval_local_idx]),
    }
    eval_batch = ctx.shard_batch(eval_local)

    @jax.jit
    def eval_fn(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )

    outputs = eval_fn(state.params, state.batch_stats, eval_batch["image"])
    eval_np = all_gather_host(outputs)

    # Collective orbax save — every process joins (trainer.py _save contract).
    save_checkpoint(outdir / f"{tag}_ckpt", state, {"tag": tag, "losses": losses})

    summary = {
        "tag": tag,
        "process_count": jax.process_count(),
        "num_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "losses": losses,
    }
    if jax.process_index() == 0:
        params_host = jax.tree_util.tree_map(
            np.asarray, jax.device_get(state.params)
        )
        flat = {
            "/".join(str(k) for k in path): leaf
            for path, leaf in _flatten(params_host)
        }
        np.savez(outdir / f"{tag}_params.npz", **flat)
        np.save(outdir / f"{tag}_eval.npy", eval_np)
        (outdir / f"{tag}_summary.json").write_text(json.dumps(summary))
    return summary


def _flatten(tree):
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        yield tuple(
            getattr(p, "key", getattr(p, "idx", str(p))) for p in path
        ), leaf


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    coordinator, pid, nprocs, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        Path(sys.argv[4]),
    )
    import jax

    # The sitecustomize preloads jax with the axon platform; flip to CPU
    # before any backend/device use (env vars are latched at import time).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 4, len(jax.local_devices())
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    # Per-rank sanity record (the parent asserts both ranks agree on losses).
    summary = run_training(outdir, tag="multi")
    (outdir / f"rank{pid}_done.json").write_text(json.dumps(summary))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
