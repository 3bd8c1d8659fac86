"""Host input pipeline: seeded shuffling, weighted sampling, threaded prefetch.

Replaces the reference's torch DataLoader + WeightedRandomSampler + collators
(trainers/base.py:363-382, datasets/sampling.py) with a numpy-native loader:

- Deterministic per-epoch shuffling from a base seed (parity with the seeded
  generator + worker_init_fn plumbing in the reference).
- Optional inverse-class-frequency weighted sampling with replacement.
- A thread pool decodes/loads samples concurrently (PNG decode + resize is
  the host bottleneck) and batches are prefetched a queue-depth ahead, so the
  accelerator never waits on the host (the reference relies on torch worker
  processes for the same reason).
- Batches are dicts of stacked numpy arrays; non-array "metadata" entries are
  collected into lists.

Under a data-parallel mesh, ``drop_last`` guarantees batch divisibility; the
trainer shards each batch over the mesh's data axis.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Protocol, Sequence

import numpy as np


class MapDataset(Protocol):
    """Indexable dataset protocol."""

    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> dict[str, Any]: ...


def default_collate(samples: Sequence[dict[str, Any]]) -> dict[str, Any]:
    """Stack array-like fields; collect 'metadata' (and other non-arrays) as lists."""
    batch: dict[str, Any] = {}
    for key in samples[0]:
        values = [s[key] for s in samples]
        first = values[0]
        if isinstance(first, dict):
            batch[key] = {
                k: _stack_or_list([v[k] for v in values]) for k in first
            }
        else:
            batch[key] = _stack_or_list(values)
    return batch


def _stack_or_list(values: list[Any]) -> Any:
    first = values[0]
    if isinstance(first, np.ndarray):
        return np.stack(values)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(values)
    return values  # metadata dicts, strings, ...


def compute_inverse_frequency_weights(labels: Sequence[Any]) -> np.ndarray:
    """Per-sample weights 1 / class_count (reference sampling.py:70-77)."""
    _, inverse, counts = np.unique(
        np.asarray(labels), return_inverse=True, return_counts=True
    )
    return (1.0 / counts)[inverse].astype(np.float64)


class DataLoader:
    """Seeded, optionally-weighted, prefetching batch loader."""

    def __init__(
        self,
        dataset: MapDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool | None = None,
        seed: int = 42,
        sample_weights: np.ndarray | None = None,
        collate_fn: Callable[[Sequence[dict[str, Any]]], dict[str, Any]] | None = None,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
    ) -> None:
        """
        Args:
            dataset: Indexable dataset.
            batch_size: Global batch size.
            shuffle: Shuffle each epoch (ignored when sample_weights given).
            drop_last: Drop the trailing partial batch (defaults to
                ``shuffle``, matching the reference's ``drop_last=shuffle``).
            seed: Base seed; epoch e uses seed + e.
            sample_weights: Optional per-sample weights -> sampling with
                replacement (weighted sampler parity).
            collate_fn: Batch assembly (default stacks arrays).
            num_workers: Threads for concurrent sample loading.
            prefetch: Batches to stage ahead.
            process_index/process_count: Multi-host sharding: every process
                draws the SAME seeded global index stream (so weighted
                sampling keeps its global class-balance property,
                SURVEY.md §7 "hard parts") and takes its contiguous
                batch_size/process_count slice of each global batch.
                Defaults to jax.process_index()/process_count().
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.sample_weights = sample_weights
        self.collate_fn = collate_fn or default_collate
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.epoch = 0
        if process_index is None or process_count is None:
            # Lazy: the explicit-args path stays numpy-only.
            import jax

            process_index = (
                jax.process_index() if process_index is None else process_index
            )
            process_count = (
                jax.process_count() if process_count is None else process_count
            )
        self.process_index = process_index
        self.process_count = process_count
        if self.batch_size % self.process_count != 0:
            raise ValueError(
                f"batch_size={batch_size} not divisible by "
                f"process_count={self.process_count}"
            )

    def set_epoch(self, epoch: int) -> None:
        """Set the epoch for deterministic reshuffling."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.sample_weights is not None:
            probs = self.sample_weights / self.sample_weights.sum()
            return rng.choice(n, size=n, replace=True, p=probs)
        if self.shuffle:
            return rng.permutation(n)
        return np.arange(n)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, Any]]:
        n_batches = len(self)
        if n_batches == 0:
            return
        indices = self._epoch_indices()

        batch_indices = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        # Real (non-duplicate) rows per yielded batch; trailing cross-host
        # padding shrinks this for the last host(s) of a partial batch.
        # n_global holds the batch's REAL global size — identical on every
        # host, so host-agnostic decisions (val-loss weighting, plateau /
        # early-stopping) stay synchronized across processes.
        n_real = [len(b) for b in batch_indices]
        n_global = [len(b) for b in batch_indices]
        if self.process_count > 1:
            # Contiguous EQUAL per-host slice of every global batch: every
            # process must iterate the same number of batches with the same
            # per-host shard size, or the next cross-host collective
            # deadlocks. A trailing partial batch is padded (repeat last
            # index) up to a process_count multiple first; the duplicated
            # rows are reported via the batch's ``_n_valid`` so eval can
            # exclude them exactly (an unmarked duplicate would be double-
            # counted in val loss/metrics).
            def host_slice(batch: np.ndarray) -> tuple[np.ndarray, int]:
                orig_len = len(batch)
                pad = (-orig_len) % self.process_count
                if pad:
                    batch = np.concatenate([batch, np.repeat(batch[-1:], pad)])
                share = len(batch) // self.process_count
                start = self.process_index * share
                valid = int(np.clip(orig_len - start, 0, share))
                return batch[start : start + share], valid

            sliced = [host_slice(b) for b in batch_indices]
            batch_indices = [b for b, _ in sliced]
            n_real = [v for _, v in sliced]

        out_queue: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # Vectorized batch path: a dataset exposing get_batch (the packed
        # sample cache) assembles the whole batch in a few C-level gathers
        # instead of B GIL-serialized __getitem__ calls + np.stack. Only
        # valid when the batch structure is default_collate's; a custom
        # collate_fn expects per-sample dicts.
        fast_batch = (
            getattr(self.dataset, "get_batch", None)
            if self.collate_fn is default_collate
            else None
        )

        def producer() -> None:
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for bidx, valid, global_valid in zip(
                        batch_indices, n_real, n_global
                    ):
                        if stop.is_set():
                            return
                        batch = fast_batch(bidx) if fast_batch else None
                        if batch is None:
                            samples = list(
                                pool.map(self.dataset.__getitem__, bidx)
                            )
                            batch = self.collate_fn(samples)
                        if global_valid % self.process_count:
                            # Padded global batch: every host gets the real
                            # global size; hosts holding duplicate rows also
                            # get their real LOCAL count.
                            batch["_n_valid_global"] = global_valid
                            if valid < len(bidx):
                                batch["_n_valid"] = valid
                        out_queue.put(batch)
                out_queue.put(None)
            except BaseException as exc:  # propagate loader errors
                out_queue.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_queue.get_nowait()
                except queue.Empty:
                    break
