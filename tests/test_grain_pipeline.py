"""Grain/ArrayRecord pipeline: pack, shuffle determinism, sharding,
mid-epoch checkpoint/resume."""
import numpy as np
import pytest

from mmearth_tpu.data import grain_pipeline as gp

pytestmark = pytest.mark.skipif(not gp.have_grain(), reason="grain not installed")


class ToyDataset:
    """Indexable sample-dict dataset (stands in for MMEarthDataset)."""

    def __init__(self, n=40):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "id": f"s{i}",
            "sentinel2": rng.normal(size=(4, 4, 3)).astype(np.float32),
            "label": np.int64(i),
        }


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    out = tmp_path_factory.mktemp("arpack")
    gp.pack_arrayrecord(ToyDataset(40), out, shard_size=16)
    return out


def test_pack_layout(packed):
    import json

    meta = json.loads((packed / "meta.json").read_text())
    assert meta["count"] == 40
    assert meta["fields"]["label"]["dtype"] == "int32"  # int64 narrowed
    assert len(meta["shards"]) == 3  # 16 + 16 + 8
    assert all((packed / s).exists() for s in meta["shards"])


def test_batches_cover_epoch(packed):
    loader = gp.GrainLoader(packed, batch_size=8, shuffle=True, seed=1)
    seen = []
    n_batches = 0
    for batch in loader:
        assert batch["sentinel2"].shape == (8, 4, 4, 3)
        assert batch["label"].dtype == np.int32
        seen.extend(batch["label"].tolist())
        n_batches += 1
    assert n_batches == len(loader) == 5
    assert sorted(seen) == list(range(40))
    # content round-trips exactly
    i = seen[0]
    expected = np.random.default_rng(i).normal(size=(4, 4, 3)).astype(np.float32)


def test_shuffle_deterministic_and_seed_sensitive(packed):
    def labels(seed):
        loader = gp.GrainLoader(packed, batch_size=8, seed=seed)
        return [l for b in loader for l in b["label"].tolist()]

    assert labels(3) == labels(3)
    assert labels(3) != labels(4)


def test_sharding_partitions(packed):
    a = gp.GrainLoader(packed, batch_size=4, seed=0, shard=(0, 2))
    b = gp.GrainLoader(packed, batch_size=4, seed=0, shard=(1, 2))
    la = [l for bt in a for l in bt["label"].tolist()]
    lb = [l for bt in b for l in bt["label"].tolist()]
    assert len(la) == len(lb) == 20
    assert not set(la) & set(lb)
    assert sorted(la + lb) == list(range(40))


def test_eval_pass_exact_no_duplicates(packed):
    # drop_last=False: one exact epoch incl. the partial final batch
    loader = gp.GrainLoader(packed, batch_size=16, shuffle=False, drop_last=False)
    sizes = [b["label"].shape[0] for b in loader]
    assert sizes == [16, 16, 8]
    assert len(loader) == 3
    seen = [l for b in loader for l in b["label"].tolist()]
    assert sorted(seen) == list(range(40))


def test_set_epoch_reshuffles(packed):
    loader = gp.GrainLoader(packed, batch_size=8, seed=5)
    loader.set_epoch(0)
    e0 = [l for b in loader for l in b["label"].tolist()]
    loader.set_epoch(1)
    e1 = [l for b in loader for l in b["label"].tolist()]
    loader.set_epoch(0)
    e0b = [l for b in loader for l in b["label"].tolist()]
    assert e0 != e1 and e0 == e0b
    assert sorted(e0) == sorted(e1) == list(range(40))


def test_multiworker_batches_exact(packed):
    # Batching happens in the parent, AFTER the worker merge: any
    # worker_count must yield every shard record exactly once per epoch
    # (per-worker pg.Batch would drop each worker's remainder — up to
    # worker_count*(batch_size-1) records lost and __len__ overcounting).
    for wc in (2, 3):
        loader = gp.GrainLoader(packed, batch_size=6, shuffle=True, seed=2,
                                drop_last=True, worker_count=wc)
        batches = list(loader)
        assert len(batches) == len(loader) == 40 // 6
        seen = [l for b in batches for l in b["label"].tolist()]
        assert len(seen) == len(set(seen)) == 6 * (40 // 6)
        # drop_last=False: all 40, exactly once
        loader = gp.GrainLoader(packed, batch_size=6, shuffle=True, seed=2,
                                drop_last=False, worker_count=wc)
        seen = [l for b in loader for l in b["label"].tolist()]
        assert sorted(seen) == list(range(40))


def test_stream_mode_worker_count_invariant(packed):
    """Stream-mode batches must not depend on worker_count: Grain's iterator
    preserves the deterministic global record order across workers, and the
    parent-side batching + shuffle-epoch alignment sit on top of that order."""
    def take(wc, n=6):
        loader = gp.GrainLoader(packed, batch_size=16, seed=4, worker_count=wc)
        it = loader.iterator()
        return [next(it)["label"].tolist() for _ in range(n)]

    assert take(0) == take(2)


def test_midepoch_checkpoint_resume(packed):
    loader = gp.GrainLoader(packed, batch_size=8, seed=7)
    it = loader.iterator()
    first = [next(it)["label"].tolist() for _ in range(2)]
    state = loader.get_state()
    rest = [next(it)["label"].tolist() for _ in range(3)]

    fresh = gp.GrainLoader(packed, batch_size=8, seed=7)
    fresh.set_state(state)
    resumed = [next(fresh.iterator())["label"].tolist() for _ in range(3)]
    assert resumed == rest


def test_stream_epochs_align_with_shuffle_epochs(packed):
    """Continuous-stream mode with per_shard not a batch multiple: 40
    records / batch 16 -> len(loader)=2, 8-record shuffle tail.  Without
    boundary alignment, driver epoch 2 would mix the tail of permutation 1
    with the head of permutation 2 (a record can repeat within the epoch);
    with it, every driver epoch is the leading 32 records of one fresh
    permutation."""
    loader = gp.GrainLoader(packed, batch_size=16, seed=3)
    assert len(loader) == 2
    it = loader.iterator()
    epochs = [[l for _ in range(len(loader)) for l in next(it)["label"].tolist()]
              for _ in range(4)]
    for ep in epochs:
        assert len(ep) == 32 and len(set(ep)) == 32, "record repeated within a driver epoch"
    assert epochs[0] != epochs[1], "shuffle epoch did not advance"


def test_stream_resume_across_epoch_boundary(packed):
    """get_state/set_state must carry the in-shuffle-epoch position so a
    resumed stream drops the same boundary tail as the unbroken one."""
    a = gp.GrainLoader(packed, batch_size=16, seed=9)
    it = a.iterator()
    next(it)  # mid-epoch
    state = a.get_state()
    unbroken = [next(it)["label"].tolist() for _ in range(4)]  # crosses boundary

    b = gp.GrainLoader(packed, batch_size=16, seed=9)
    b.set_state(state)
    resumed = [next(b.iterator())["label"].tolist() for _ in range(4)]
    assert resumed == unbroken


def test_values_roundtrip(packed):
    loader = gp.GrainLoader(packed, batch_size=8, shuffle=False)
    batch = next(iter(loader))
    for j in range(8):
        i = int(batch["label"][j])
        expected = np.random.default_rng(i).normal(size=(4, 4, 3)).astype(np.float32)
        np.testing.assert_array_equal(batch["sentinel2"][j], expected)
