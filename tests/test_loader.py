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


# ---------------------------------------------------------------------------
# Multi-host simulation (VERDICT r1 item 7): faked process_index/process_count
# ---------------------------------------------------------------------------


class _IdxDataset:
    """Sample = its own index, so batches expose the index stream."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {"idx": np.asarray(idx), "x": np.full((3,), idx, np.float32)}


def _loader(n, bs, pc, pi, **kw):
    from spine_vision_tpu.data.loader import DataLoader

    kw.setdefault("shuffle", True)
    return DataLoader(
        _IdxDataset(n),
        batch_size=bs,
        seed=7,
        num_workers=2,
        process_count=pc,
        process_index=pi,
        **kw,
    )


@pytest.mark.parametrize("pc", [2, 4])
def test_multihost_global_batch_reassembly(pc):
    """Concatenating every host's shard of batch b must equal the
    single-process global batch b, for every batch."""
    n, bs = 103, 16
    global_batches = [b["idx"] for b in _loader(n, bs, 1, 0)]
    per_host = [[b["idx"] for b in _loader(n, bs, pc, pi)] for pi in range(pc)]

    counts = {len(batches) for batches in per_host}
    assert counts == {len(global_batches)}  # equal batch counts per host
    for bi, gb in enumerate(global_batches):
        reassembled = np.concatenate([per_host[pi][bi] for pi in range(pc)])
        np.testing.assert_array_equal(reassembled, gb)


@pytest.mark.parametrize("pc", [2, 4])
def test_multihost_weighted_sampling_preserves_balance(pc):
    """Weighted sampling draws the SAME seeded global stream on every host,
    so the union of host shards keeps the global class-balance property."""
    n, bs = 96, 24
    # Two imbalanced classes: 80 of class 0, 16 of class 1.
    labels = np.asarray([0] * 80 + [1] * 16)
    from spine_vision_tpu.data.loader import compute_inverse_frequency_weights

    weights = compute_inverse_frequency_weights(labels)

    global_idx = np.concatenate(
        [b["idx"] for b in _loader(n, bs, 1, 0, sample_weights=weights)]
    )
    union = np.concatenate(
        [
            np.concatenate(
                [b["idx"] for b in _loader(n, bs, pc, pi, sample_weights=weights)]
            )
            for pi in range(pc)
        ]
    )
    # Same multiset of drawn indices -> identical class balance.
    np.testing.assert_array_equal(np.sort(union), np.sort(global_idx))
    drawn_classes = labels[union]
    frac1 = (drawn_classes == 1).mean()
    assert 0.3 < frac1 < 0.7  # balanced despite 80/16 skew


def test_multihost_trailing_batch_padded_equally():
    """A trailing partial batch (drop_last=False) must still give every host
    the same number of rows (collective-deadlock guard)."""
    n, bs, pc = 18, 8, 4
    per_host = [
        [b["idx"] for b in _loader(n, bs, pc, pi, shuffle=False, drop_last=False)]
        for pi in range(pc)
    ]
    for pi in range(pc):
        assert len(per_host[pi]) == 3
        sizes = [len(b) for b in per_host[pi]]
        assert sizes == [2, 2, 1]  # trailing global batch of 2 padded to 4


def test_multihost_trailing_duplicates_marked_invalid():
    """Cross-host padding duplicates must be reported via _n_valid so eval
    excludes them: summed across hosts, valid rows == dataset rows exactly
    (regression: duplicates used to count as real samples in val metrics)."""
    n, bs, pc = 18, 8, 4
    total_valid = 0
    globals_seen = []
    for pi in range(pc):
        loader = _loader(n, bs, pc, pi, shuffle=False, drop_last=False)
        host_globals = []
        for batch in loader:
            valid = batch.get("_n_valid", len(batch["idx"]))
            total_valid += valid
            # Rows beyond _n_valid are duplicates of the last real index.
            if "_n_valid" in batch:
                assert valid < len(batch["idx"])
            host_globals.append(batch.get("_n_valid_global"))
        globals_seen.append(host_globals)
    assert total_valid == n
    # Every host sees the identical global-valid sequence (None for full
    # batches, the real global size for the padded trailing one) — the
    # trainer uses it for host-synchronized val-loss weighting.
    assert all(g == globals_seen[0] for g in globals_seen)
    assert globals_seen[0] == [None, None, 2]


def test_inverse_frequency_weights_vectorized():
    from spine_vision_tpu.data.loader import compute_inverse_frequency_weights

    labels = np.asarray([0, 0, 1, 2, 2, 2])
    weights = compute_inverse_frequency_weights(labels)
    np.testing.assert_allclose(weights, [0.5, 0.5, 1.0, 1 / 3, 1 / 3, 1 / 3])


def test_empty_dataset_yields_no_batches():
    loader = _loader(0, 8, 1, 0, shuffle=False, drop_last=False)
    assert list(loader) == []
    weighted = _loader(
        0, 8, 1, 0, shuffle=True, sample_weights=np.asarray([], np.float64)
    )
    assert list(weighted) == []
