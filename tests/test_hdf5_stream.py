"""--loader hdf5: stream training batches straight from the HDF5 (the
reference's no_ffcv DataLoader path, mmearth_dataset.py:273-277)."""
import numpy as np
import pytest

from mmearth_tpu.configs import modalities as M
from mmearth_tpu.data.mmearth import HDF5StreamLoader, MMEarthDataset
from mmearth_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def h5dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("h5stream")
    generate(out, n=24, tile=16)
    return out


def _mods():
    return {**M.INP_MODALITIES, **{k: v for k, v in M.OUT_MODALITIES.items()}}


def test_epoch_is_exact_cover_and_matches_dataset(h5dir):
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    loader = HDF5StreamLoader(ds, batch_size=4, shuffle=True, seed=3)
    n_train = len(ds)
    seen = 0
    first = None
    for batch in loader:
        if first is None:
            first = batch
        assert set(batch) == set(_mods())
        for k, v in batch.items():
            assert v.shape[0] == 4
            assert v.dtype != np.int64  # int32 on the wire (pack parity)
        seen += 4
    assert seen == (n_train // 4) * 4

    # shuffled content still comes from the dataset's own transforms: every
    # row of the first batch equals some dataset sample exactly
    all_s2 = np.stack([ds[i]["sentinel2"] for i in range(n_train)])
    for row in first["sentinel2"]:
        assert (np.isclose(all_s2, row[None], equal_nan=True)
                .all(axis=(1, 2, 3)).any())


def test_shards_are_disjoint_and_cover(h5dir):
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    got = []
    for rank in range(2):
        loader = HDF5StreamLoader(ds, batch_size=2, shuffle=True, seed=1,
                                  shard=(rank, 2), drop_last=False)
        loader.set_epoch(5)
        for b in loader:
            got.extend(np.asarray(b["lat"]).tolist())
    ref = [ds[i]["lat"].tolist() for i in range(len(ds))]
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_set_epoch_reshuffles(h5dir):
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    loader = HDF5StreamLoader(ds, batch_size=4, shuffle=True, seed=0)
    b0 = next(iter(loader))
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.allclose(b0["sentinel2"], b1["sentinel2"], equal_nan=True)


def test_debug_indices_subset(h5dir):
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    loader = HDF5StreamLoader(ds, batch_size=2, shuffle=False,
                              indices=list(range(6)))
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    np.testing.assert_allclose(
        batches[0]["sentinel2"][0], ds[0]["sentinel2"], equal_nan=True)


def test_prefetch_worker_error_propagates(h5dir):
    """A read error mid-epoch must raise in the consumer, not deadlock the
    prefetch queue (the worker forwards exceptions through the queue)."""
    ds = MMEarthDataset(h5dir, _mods(), split="train")

    class Boom(MMEarthDataset):
        def __init__(self):  # share the open file/state
            self.__dict__.update(ds.__dict__)

        def get_rows(self, positions):
            if np.asarray(positions).max() >= 8:
                raise RuntimeError("corrupt chunk")
            return super().get_rows(positions)

    loader = HDF5StreamLoader(Boom(), batch_size=4, shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt chunk"):
        for _ in loader:
            pass


def test_abandoned_iterator_reclaims_thread(h5dir):
    """`next(iter(loader))` (the driver's shape probe) must not leak a worker
    thread blocked on a full prefetch queue."""
    import gc
    import threading
    import time

    ds = MMEarthDataset(h5dir, _mods(), split="train")
    loader = HDF5StreamLoader(ds, batch_size=2, shuffle=False, prefetch=1)
    base = threading.active_count()
    next(iter(loader))
    gc.collect()
    deadline = time.time() + 8
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= base


def test_get_rows_bit_identical_to_per_sample(h5dir):
    """The batched HDF5 read path must equal stacked per-sample reads exactly
    (incl. the per-tile l1c/l2a sentinel2 stats and the un-sorting)."""
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    rng = np.random.default_rng(0)
    positions = rng.permutation(len(ds))[:9]  # shuffled, not pre-sorted
    batch = ds.get_rows(positions)
    for i, pos in enumerate(positions):
        ref = ds[int(pos)]
        assert batch["id"][i] == ref["id"]
        for k, v in ref.items():
            if k == "id":
                continue
            assert batch[k].dtype == v.dtype, k
            np.testing.assert_array_equal(
                batch[k][i], v, err_msg=f"{k} @ position {pos}")


def test_get_rows_accepts_duplicate_positions(h5dir):
    """Repeated indices (class oversampling) must work like per-sample reads
    (h5py fancy indexing alone would reject duplicates)."""
    ds = MMEarthDataset(h5dir, _mods(), split="train")
    batch = ds.get_rows(np.array([3, 3, 5, 0, 3]))
    assert batch["id"][0] == batch["id"][1] == batch["id"][4]
    np.testing.assert_array_equal(batch["sentinel2"][0], batch["sentinel2"][1])
    np.testing.assert_array_equal(
        batch["sentinel2"][2],
        ds[5]["sentinel2"],
    )
