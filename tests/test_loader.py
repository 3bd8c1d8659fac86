"""DataLoader: determinism, weighted sampling, multi-host sharding."""

import numpy as np
import pytest

from spine_vision_tpu.data.loader import (
    DataLoader,
    compute_inverse_frequency_weights,
)


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {"x": np.asarray([idx], dtype=np.int64)}


def _collect_ids(loader):
    return [batch["x"].ravel().tolist() for batch in loader]


def test_deterministic_reshuffle():
    ds = _ArrayDataset(32)
    a = DataLoader(ds, batch_size=8, seed=7, num_workers=1)
    b = DataLoader(ds, batch_size=8, seed=7, num_workers=1)
    a.set_epoch(3)
    b.set_epoch(3)
    assert _collect_ids(a) == _collect_ids(b)
    b.set_epoch(4)
    assert _collect_ids(a) != _collect_ids(b)


def test_weighted_sampling_balances_classes():
    labels = [0] * 90 + [1] * 10
    weights = compute_inverse_frequency_weights(labels)
    ds = _ArrayDataset(100)
    loader = DataLoader(
        ds, batch_size=20, sample_weights=weights, seed=0, num_workers=1
    )
    drawn = [i for ids in _collect_ids(loader) for i in ids]
    minority = sum(1 for i in drawn if i >= 90)
    # Inverse-frequency weighting should draw the 10% class near 50%.
    assert 0.3 <= minority / len(drawn) <= 0.7


def test_multihost_slices_partition_global_batch():
    ds = _ArrayDataset(64)
    shards = [
        DataLoader(
            ds,
            batch_size=16,
            seed=3,
            num_workers=1,
            process_index=rank,
            process_count=4,
        )
        for rank in range(4)
    ]
    global_loader = DataLoader(ds, batch_size=16, seed=3, num_workers=1)
    per_rank = [_collect_ids(s) for s in shards]
    global_batches = _collect_ids(global_loader)
    assert all(len(r) == len(global_batches) for r in per_rank)
    for step, global_batch in enumerate(global_batches):
        merged = [i for rank in range(4) for i in per_rank[rank][step]]
        assert merged == global_batch  # contiguous slices tile the batch
        assert all(len(per_rank[rank][step]) == 4 for rank in range(4))


def test_multihost_batch_divisibility_check():
    with pytest.raises(ValueError, match="not divisible"):
        DataLoader(
            _ArrayDataset(8),
            batch_size=10,
            process_index=0,
            process_count=4,
        )
