"""Device mesh construction, shardings, and collective helpers."""

from spine_vision_tpu.parallel.mesh import (
    MeshContext,
    all_gather_host,
    batch_sharded_jit,
    batch_sharding,
    data_parallel_mesh,
    initialize_distributed,
    is_main_process,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshContext",
    "all_gather_host",
    "batch_sharded_jit",
    "batch_sharding",
    "data_parallel_mesh",
    "initialize_distributed",
    "is_main_process",
    "make_mesh",
    "pad_to_multiple",
    "replicated_sharding",
    "shard_batch",
]
