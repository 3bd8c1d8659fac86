"""Checkpoint save/restore (orbax) with the reference's run-dir layout.

Layout (parity with reference trainers/base.py:687-736):

    weights/<task>/<run_id>/
        best_model/            orbax pytree (params/opt_state/batch_stats/...)
        checkpoint_epoch_N/    periodic checkpoints
        config.yaml            config snapshot
        logs/                  visualizations + metrics

Alongside each orbax directory a ``meta.json`` records epoch, best metric,
and history — the non-array payload the reference stuffs into its torch.save
dict.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from spine_vision_tpu.train.state import TrainState


def _state_payload(state: TrainState) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "dropout_key": jax.random.key_data(state.dropout_key)
        if jax.dtypes.issubdtype(state.dropout_key.dtype, jax.dtypes.prng_key)
        else state.dropout_key,
    }


def save_checkpoint(path: Path, state: TrainState, meta: dict[str, Any]) -> None:
    """Save train state (orbax) + metadata (json sidecar).

    Must be called by EVERY process in a multi-process run (the orbax save
    of sharded arrays is a collective); only the sidecar write is gated to
    process 0.
    """
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(path, _state_payload(state), force=True)
    if jax.process_index() == 0:
        (path.parent / f"{path.name}.meta.json").write_text(
            json.dumps(meta, default=_json_default)
        )


def _json_default(obj: Any) -> Any:
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, Path):
        return str(obj)
    raise TypeError(f"Cannot serialize {type(obj)}")


def load_checkpoint(
    path: Path,
    state_template: TrainState,
    restore_opt_state: bool = True,
) -> tuple[TrainState, dict[str, Any]]:
    """Restore a checkpoint into a freshly-created state's structure.

    Args:
        path: orbax checkpoint directory (e.g. .../best_model).
        state_template: A state with the target structure (from
            ``TrainState.create`` on the same model/optimizer).
        restore_opt_state: Restore the optimizer state too. Pass False for
            inference-time loads built with a placeholder optimizer
            (optax.identity) — the on-disk optimizer tree then need not
            match the template's.

    Returns:
        (restored state, metadata dict).
    """
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as checkpointer:
        if restore_opt_state:
            template = _state_payload(state_template)
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            restored = checkpointer.restore(path, abstract)
        else:
            # No template: restore with the on-disk structure (whatever
            # optimizer trained it) and take only the model state. Build
            # the abstract tree from the checkpoint's own metadata but with
            # CURRENT-device sharding — a bare restore would try to rebuild
            # the shardings of the machine that saved it, so a checkpoint
            # trained on an 8-device mesh could never load on a single
            # inference chip.
            sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

            def _abstract(meta: Any) -> Any:
                shape = getattr(meta, "shape", None)
                dtype = getattr(meta, "dtype", None)
                if shape is None or dtype is None:
                    return meta  # non-array leaf: keep as-is
                return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

            item_metadata = checkpointer.metadata(path).item_metadata
            if item_metadata is None:
                # No orbax metadata (older writer / external artifact):
                # fall back to the bare restore, which works when the
                # current topology matches the saving one.
                restored = checkpointer.restore(path)
            else:
                abstract = jax.tree_util.tree_map(_abstract, item_metadata.tree)
                restored = checkpointer.restore(path, abstract)

    dropout_key = restored["dropout_key"]
    if jax.dtypes.issubdtype(state_template.dropout_key.dtype, jax.dtypes.prng_key):
        dropout_key = jax.random.wrap_key_data(dropout_key)

    state = state_template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        dropout_key=dropout_key,
        **(
            {"opt_state": restored["opt_state"]}
            if restore_opt_state
            else {}
        ),
    )

    meta_path = path.parent / f"{path.name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta
