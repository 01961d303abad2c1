"""PackedLoader ordering: the FFCV OrderOption equivalents (reference
mmearth_dataset.py:306-310) — RANDOM, QUASI_RANDOM (locality-bounded
shuffle), SEQUENTIAL."""
import numpy as np
import pytest

from mmearth_tpu.data.loader import PackedDataset, PackedLoader
from mmearth_tpu.data.pack import pack_split


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    n = 512
    x = np.arange(n, dtype=np.float32).reshape(n, 1)

    class _Items:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"x": x[i], "id": str(i)}

    return PackedDataset(pack_split(_Items(), tmp_path_factory.mktemp("pack") / "d", log_every=0))


def _epoch_indices(loader):
    return np.concatenate([b["x"][:, 0].astype(np.int64) for b in loader])


def test_quasi_random_is_permutation_and_local(packed):
    loader = PackedLoader(packed, 32, order="quasi_random", drop_last=False,
                          seed=0, chunk_size=16, window_chunks=4)
    idx = _epoch_indices(loader)
    # every sample exactly once
    assert sorted(idx.tolist()) == list(range(512))
    # not sequential
    assert not np.array_equal(idx, np.arange(512))
    # locality: each aligned output window of 64 (= chunk_size * window_chunks)
    # spans exactly one contiguous storage window, unlike a full shuffle
    w = 16 * 4
    spans = [idx[i : i + w].max() - idx[i : i + w].min() for i in range(0, 512, w)]
    assert max(spans) <= w - 1
    full = PackedLoader(packed, 32, order="random", drop_last=False, seed=0)
    fidx = _epoch_indices(full)
    fspans = [fidx[i : i + w].max() - fidx[i : i + w].min() for i in range(0, 512, w)]
    assert np.mean(spans) < np.mean(fspans)

    # deterministic per (seed, epoch); reshuffles across epochs
    again = _epoch_indices(PackedLoader(packed, 32, order="quasi_random", drop_last=False,
                                        seed=0, chunk_size=16, window_chunks=4))
    np.testing.assert_array_equal(idx, again)
    loader.set_epoch(1)
    idx2 = _epoch_indices(loader)
    assert not np.array_equal(idx, idx2)
    assert sorted(idx2.tolist()) == list(range(512))


def test_order_aliases(packed):
    seq = _epoch_indices(PackedLoader(packed, 32, shuffle=False, drop_last=False))
    np.testing.assert_array_equal(seq, np.arange(512))
    rnd = _epoch_indices(PackedLoader(packed, 32, shuffle=True, drop_last=False, seed=3))
    assert sorted(rnd.tolist()) == list(range(512))
    with pytest.raises(ValueError):
        PackedLoader(packed, 32, order="bogus")
