"""Decode-once packed sample cache for the host input pipeline.

The training-time host bottleneck is per-sample PNG decode + resize inside
``Dataset.__getitem__`` (the reference pays the same cost in its torch
DataLoader workers every epoch, training/trainers/base.py:363-382). Host
``__getitem__`` in this framework is deterministic — augmentations run on
device (ops/augment.py) — so samples can be decoded ONCE into a packed,
memory-mapped column store and every subsequent epoch streams them back at
page-cache speed instead of re-decoding.

Layout (one directory per cache):
    index.json          {n, fields: {path: {shape, dtype}}, fingerprint}
    <field>.npy         [N, *shape] memmap per array field ('/' in nested
                        paths is encoded as '__' in filenames)
    metadata.json       list of the non-array remainder of each sample

This is the TPU-framework analogue of TFRecord/ArrayRecord preprocessing:
build on first use, then the loader's thread pool only slices memmaps.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any

import numpy as np

from spine_vision_tpu.core import logger

_INDEX = "index.json"
_META = "metadata.json"


def _flatten_arrays(
    sample: dict[str, Any], prefix: str = ""
) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
    """Split a sample dict into (flat array fields, non-array remainder)."""
    arrays: dict[str, np.ndarray] = {}
    rest: dict[str, Any] = {}
    for key, value in sample.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            sub_arrays, sub_rest = _flatten_arrays(value, path)
            arrays.update(sub_arrays)
            if sub_rest:
                rest[key] = sub_rest
        elif isinstance(value, (np.ndarray, np.generic, int, float, bool)):
            arrays[path] = np.asarray(value)
        else:
            rest[key] = value
    return arrays, rest


def _unflatten(flat: dict[str, Any]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def _field_file(cache_dir: Path, field: str) -> Path:
    return cache_dir / (field.replace("/", "__") + ".npy")


def _fingerprint(n: int, specs: dict[str, dict], token: str) -> str:
    parts = [str(n), token]
    for field in sorted(specs):
        spec = specs[field]
        parts.append(f"{field}:{spec['dtype']}:{tuple(spec['shape'])}")
    return "|".join(parts)


class PackedDataset:
    """MapDataset over a built cache directory (mmap-backed, zero decode).

    ``source`` (optional) is the dataset the cache was built from; attribute
    lookups that the packed view doesn't own (``get_stats``,
    ``compute_class_weights``, trainer hooks' introspection, ...) delegate to
    it, so a PackedDataset is a drop-in wherever the source dataset goes.
    """

    def __init__(self, cache_dir: Path, source: Any | None = None) -> None:
        self.source = source
        self.cache_dir = Path(cache_dir)
        with open(self.cache_dir / _INDEX) as f:
            self.index = json.load(f)
        self.n = int(self.index["n"])
        self.fields = {
            field: np.load(_field_file(self.cache_dir, field), mmap_mode="r")
            for field in self.index["fields"]
        }
        with open(self.cache_dir / _META) as f:
            self.metadata = json.load(f)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> dict[str, Any]:
        flat: dict[str, Any] = {
            # Copy the row out of the memmap: downstream stacking would do
            # the same read anyway, and a materialized array never dangles
            # if the cache object is dropped.
            field: np.array(arr[idx])
            for field, arr in self.fields.items()
        }
        sample = _unflatten(flat)
        rest = self.metadata[idx]
        for key, value in rest.items():
            sample[key] = value
        return sample

    def __getattr__(self, name: str) -> Any:
        # Only called when normal lookup fails: delegate to the source
        # dataset so trainer hooks (get_stats, compute_class_weights, ...)
        # keep working through the packed view.
        source = self.__dict__.get("source")
        if source is not None:
            return getattr(source, name)
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{name}' "
            "(no source dataset attached)"
        )


def build_packed_cache(
    dataset: Any,
    cache_dir: Path,
    num_workers: int = 8,
    fingerprint_token: str = "",
) -> Path:
    """Materialize ``dataset`` into ``cache_dir`` (overwrites stale content).

    Every sample's array fields must share shapes/dtypes with sample 0
    (true for this package's datasets: fixed output_size, fixed targets).
    """
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    n = len(dataset)
    if n == 0:
        raise ValueError("Cannot cache an empty dataset")
    first_arrays, _ = _flatten_arrays(dataset[0])
    specs = {
        field: {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        for field, arr in first_arrays.items()
    }
    mms = {
        field: np.lib.format.open_memmap(
            _field_file(cache_dir, field),
            mode="w+",
            dtype=np.dtype(spec["dtype"]),
            shape=(n, *spec["shape"]),
        )
        for field, spec in specs.items()
    }
    metadata: list[dict[str, Any] | None] = [None] * n

    def write_row(idx: int) -> None:
        arrays, rest = _flatten_arrays(dataset[idx])
        for field, mm in mms.items():
            value = arrays[field]
            if value.shape != mm.shape[1:] or value.dtype != mm.dtype:
                raise ValueError(
                    f"Sample {idx} field '{field}' is "
                    f"{value.dtype}{value.shape}, cache expects "
                    f"{mm.dtype}{mm.shape[1:]}"
                )
            mm[idx] = value
        metadata[idx] = rest

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        # list() propagates the first worker exception.
        list(pool.map(write_row, range(n)))
    for mm in mms.values():
        mm.flush()

    with open(cache_dir / _META, "w") as f:
        json.dump(metadata, f)
    index = {
        "n": n,
        "fields": specs,
        "fingerprint": _fingerprint(n, specs, fingerprint_token),
    }
    with open(cache_dir / _INDEX, "w") as f:
        json.dump(index, f, indent=1)
    logger.info(
        "Packed %d samples (%d fields) into %s", n, len(specs), cache_dir
    )
    return cache_dir


def packed_view(
    dataset: Any,
    cache_dir: Path,
    num_workers: int = 8,
    fingerprint_token: str = "",
) -> PackedDataset:
    """Return a PackedDataset for ``dataset``, building the cache if the
    directory is missing or its fingerprint (sample count + field specs +
    caller token) no longer matches."""
    cache_dir = Path(cache_dir)
    index_path = cache_dir / _INDEX
    if index_path.exists():
        try:
            with open(index_path) as f:
                index = json.load(f)
            first_arrays, _ = _flatten_arrays(dataset[0])
            specs = {
                field: {"shape": list(arr.shape), "dtype": str(arr.dtype)}
                for field, arr in first_arrays.items()
            }
            want = _fingerprint(len(dataset), specs, fingerprint_token)
            if index.get("fingerprint") == want:
                logger.info("Reusing packed sample cache: %s", cache_dir)
                return PackedDataset(cache_dir, source=dataset)
            logger.info(
                "Packed cache %s is stale (fingerprint mismatch); rebuilding",
                cache_dir,
            )
        except Exception as exc:  # corrupt cache -> rebuild
            logger.warning("Packed cache %s unreadable (%s); rebuilding", cache_dir, exc)
    build_packed_cache(
        dataset, cache_dir, num_workers=num_workers,
        fingerprint_token=fingerprint_token,
    )
    return PackedDataset(cache_dir, source=dataset)
