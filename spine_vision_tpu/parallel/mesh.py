"""Device mesh, shardings, and process helpers.

This is the framework's replacement for the reference's HF Accelerate layer
(trainers/base.py:229-266): instead of DDP wrapping + NCCL all-reduce, data
parallelism is expressed as GSPMD shardings over a named mesh — the gradient
all-reduce becomes an XLA-fused psum over ICI, inserted automatically by the
compiler from the sharding annotations. The mesh is constructed once and
carried around as a :class:`MeshContext`.

Axes:
    data  - batch (data parallel); always present.
    model - reserved for tensor parallelism (size 1 by default so the same
            code runs unchanged when a model axis is added; reference has no
            TP, SURVEY.md §2.3).

Multi-host: ``jax.distributed`` initialization is the caller's concern; all
helpers here use ``jax.process_index()`` for main-process gating (the
replacement for ``accelerator.is_main_process``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_main_process() -> bool:
    """True on process 0 (reference: accelerator.is_main_process)."""
    return jax.process_index() == 0


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host (DCN) initialization — the launch story the reference gets
    from ``accelerate launch`` (trainers/base.py:626-628).

    Call once per process before any device use. With no arguments, relies
    on the cluster environment (TPU pod metadata / ``JAX_COORDINATOR_ADDRESS``
    etc.), which ``jax.distributed.initialize`` auto-detects; explicit
    arguments cover bare-metal multi-host launches:

        spine-vision-tpu train localization --distributed ...   (per host)

    Returns True if initialization ran, False if it was skipped because the
    runtime is already initialized or single-process with no coordinator
    configured. Idempotent: safe to call from every entry point.
    """
    import os

    from jax._src import distributed as _dist

    already = getattr(_dist.global_state, "client", None) is not None
    if already:
        return False
    has_config = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if not has_config:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


@dataclass(frozen=True)
class MeshContext:
    """A named device mesh plus its canonical shardings."""

    mesh: Mesh

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    @property
    def data_axis_size(self) -> int:
        return self.mesh.shape["data"]

    def batch_sharding(self) -> NamedSharding:
        """Sharding for [B, ...] arrays: batch split over the data axis."""
        return NamedSharding(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        """Fully-replicated sharding (params, small arrays)."""
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: Any) -> Any:
        """Device-put a host batch pytree with batch-axis sharding.

        Single-process: ``batch`` is the global batch. Multi-process:
        ``batch`` is this process's contiguous slice of the global batch
        (exactly what :class:`~spine_vision_tpu.data.loader.DataLoader`
        yields with its process slicing), and the global jax.Array is
        assembled from the per-process shards — the data itself never
        crosses hosts. Per-array batch dims must be divisible by the data
        axis size; the input pipeline guarantees this by padding/dropping
        remainders.
        """
        sharding = self.batch_sharding()
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                ),
                batch,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), sharding), batch
        )

    def replicate(self, tree: Any) -> Any:
        """Device-put a pytree fully replicated across the mesh.

        Multi-process: every process must pass the same (full) host values;
        each contributes its addressable replicas of the global array.
        """
        sharding = self.replicated()
        if jax.process_count() > 1:
            def _rep(x: Any) -> jax.Array:
                arr = np.asarray(x)
                return jax.make_array_from_callback(
                    arr.shape, sharding, lambda idx: arr[idx]
                )

            return jax.tree_util.tree_map(_rep, tree)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_mesh(
    num_devices: int | None = None,
    model_parallel: int = 1,
    devices: list[Any] | None = None,
) -> MeshContext:
    """Create a ("data", "model") mesh over the available devices.

    Args:
        num_devices: Use only the first N devices (default: all).
        model_parallel: Size of the model axis (1 = pure DP).
        devices: Explicit device list (for tests).

    Returns:
        MeshContext wrapping the constructed mesh.
    """
    devs = devices if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested num_devices={num_devices} but only {len(devs)} "
                f"device(s) are visible on backend "
                f"{devs[0].platform if devs else '?'}; provision a virtual "
                "mesh (xla_force_host_platform_device_count) or use fewer"
            )
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    data = n // model_parallel
    device_array = np.asarray(devs).reshape(data, model_parallel)
    mesh = Mesh(device_array, axis_names=("data", "model"))
    return MeshContext(mesh=mesh)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad every array leaf's leading dim up to a multiple by repeating the
    last row, so trailing eval batches keep static mesh-divisible shapes.

    Returns (padded_batch, n_valid). Callers slice step outputs back to
    ``n_valid`` before aggregating, so padding never leaks into metrics.
    """
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = int(np.asarray(leaves[0]).shape[0])
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def _pad(x: Any) -> np.ndarray:
        arr = np.asarray(x)
        tail = np.repeat(arr[-1:], pad, axis=0)
        return np.concatenate([arr, tail], axis=0)

    return jax.tree_util.tree_map(_pad, batch), n


def batch_sharding(ctx: MeshContext) -> NamedSharding:
    """Canonical batch sharding for a mesh context."""
    return ctx.batch_sharding()


def replicated_sharding(ctx: MeshContext) -> NamedSharding:
    """Canonical replicated sharding for a mesh context."""
    return ctx.replicated()


def shard_batch(ctx: MeshContext, batch: Any) -> Any:
    """Shard a host batch over the mesh's data axis."""
    return ctx.shard_batch(batch)


def data_parallel_mesh() -> Mesh:
    """A pure data-parallel ``("data",)`` mesh over every local device
    (the serving/dataset-build scale-out mesh)."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def batch_sharded_jit(
    fn: Any,
    mesh: Mesh,
    n_replicated: int,
    n_sharded: int,
    gather_outputs: bool = False,
) -> Any:
    """jit ``fn`` for data-parallel execution over ``mesh``.

    The first ``n_replicated`` positional args (weight pytrees) are
    replicated; the following ``n_sharded`` args are sharded along the
    mesh's FIRST axis (their leading dim must be a multiple of that axis
    size). Outputs stay batch-sharded by default (every pipeline output is
    batch-leading, and a single-process ``jax.device_get`` assembles sharded
    arrays without an on-device all-gather — replicating e.g. the
    [N, S, L, ch, cw] crop tensor across devices wastes ICI + HBM on the
    serve path). Pass ``gather_outputs=True`` for replicated outputs (needed
    if shards are consumed on-device by non-addressable processes).
    """
    axis = mesh.axis_names[0]
    batch = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(replicated,) * n_replicated + (batch,) * n_sharded,
        out_shardings=replicated if gather_outputs else batch,
    )


def all_gather_host(x: Any) -> np.ndarray:
    """Fetch a (possibly sharded) device array fully to host numpy.

    For single-process meshes jax.device_get suffices (jit outputs are
    globally addressable); multi-host eval gathers go through
    ``multihost_utils.process_allgather``.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled=True: concatenate shards along axis 0 (a globally-sharded
        # batch gathers to the full batch; replicated arrays pass through).
        # Gathering non-fully-addressable arrays REQUIRES tiled=True —
        # found by the real 2-process test (tests/test_multiprocess.py).
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))
