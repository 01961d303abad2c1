"""MMEarth HDF5 dataset reader.

Reproduces the reference ``MMEarthDataset.__getitem__`` transforms exactly
(mmearth_dataset.py:58-153):

  * band selection against the full band lists (:71-77),
  * dynamic_world label remap 1..9 -> 0..8, no-data/>8 -> NaN (:88-97),
  * esa_worldcover remap 10,20,...,100 -> 0..10, no-data/>10 -> NaN (:99-107),
  * NO_DATA -> NaN for everything else (:109-114),
  * per-band z-normalization with the l1c/l2a sentinel2 stats chosen per tile
    (:116-135),
  * categorical modalities -> int (NaN -> -1), continuous -> float32
    (:137-143).

This reader is the *offline* path: training reads the packed format produced
by :mod:`mmearth_tpu.data.pack` (the FFCV-beton equivalent).

Output layout is HWC (TPU-native) rather than the reference's CHW.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping, Sequence

import numpy as np

from ..configs import modalities as M
from .loader import PackedLoader


def find_data_files(data_root: Path) -> dict[str, Path]:
    """Locate the four dataset files by glob (mmearth_dataset.py:163-177)."""
    data_root = Path(data_root)

    def one(pattern):
        matches = list(data_root.glob(pattern))
        assert len(matches) == 1, f"expected exactly one {pattern} at {data_root}, got {matches}"
        return matches[0]

    return {
        "data": one("data_*.h5"),
        "splits": one("data_*_splits.json"),
        "tile_info": one("data_*_tile_info.json"),
        "band_stats": one("data_*_band_stats.json"),
    }


class MMEarthDataset:
    """Map-style reader over the MMEarth HDF5 (lazy per-worker file open,
    mmearth_dataset.py:52-62)."""

    def __init__(
        self,
        data_root: Path | str,
        modalities: Mapping[str, Sequence[str] | str],
        split: str = "train",
        channels_last: bool = True,
    ):
        files = find_data_files(Path(data_root))
        self.data_path = files["data"]
        with open(files["splits"]) as f:
            self.indices = json.load(f)[split]
        with open(files["tile_info"]) as f:
            self.tile_info = json.load(f)
        with open(files["band_stats"]) as f:
            self.band_stats = json.load(f)
        self.modalities = dict(modalities)
        self.band_idx = M.band_indices(self.modalities)
        self.channels_last = channels_last
        self._h5 = None

    def __len__(self):
        return len(self.indices)

    def _file(self):
        if self._h5 is None:
            import h5py

            self._h5 = h5py.File(self.data_path, "r")
        return self._h5

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        # single source of truth: the batched pipeline with one position
        # (transform parity vs the reference is asserted through this path,
        # tests/test_pretrain_e2e.py::test_dataset_transform_parity)
        out = self.get_rows(np.array([idx]))
        item = {k: v[0] for k, v in out.items() if k != "id"}
        item["id"] = out["id"][0]
        return item

    def get_rows(self, positions: np.ndarray) -> dict[str, np.ndarray]:
        """Batched ``__getitem__``: one HDF5 read per modality for the whole
        batch, transforms vectorized over the batch axis.  Bit-identical to
        stacking per-sample reads (tests/test_hdf5_stream.py); measured 3x the
        per-sample streaming throughput (85 -> 253 samples/s/core at batch 256
        on 64-px synthetic data — fancy-index reads amortize h5py's per-call
        overhead)."""
        positions = np.asarray(positions)
        f = self._file()
        rows = np.asarray(self.indices)[positions]
        # h5py fancy indexing wants increasing *unique* rows; `inverse` maps
        # each requested position back to its row in the deduped sorted read
        rows_sorted, inverse = np.unique(rows, return_inverse=True)

        meta = f["metadata"][rows_sorted]
        names = [m[0].decode("utf-8") for m in meta]
        l2a = np.array([self.tile_info[n]["S2_type"] == "l2a" for n in names])

        out: dict[str, np.ndarray] = {}
        for modality in self.modalities:
            sel = self.band_idx[modality]
            if modality in ("biome", "eco_region"):
                data = np.array(f[modality][rows_sorted, ...], dtype=np.float64)
            else:
                # one fancy index per read: select rows in h5, bands in numpy
                data = np.array(f[modality][rows_sorted, ...], dtype=np.float64)[:, sel, ...]

            no_data = M.NO_DATA_VAL[modality]
            if modality == "dynamic_world":
                data = np.where(data == no_data, np.nan, data)
                data = np.where((data >= 1) & (data <= 9), data - 1.0, data)
                data = np.where(data > 8, np.nan, data)
            elif modality == "esa_worldcover":
                data = np.where(data == no_data, np.nan, data)
                remapped = np.where(data == 95, 9.0, np.where(data == 100, 10.0, data / 10.0 - 1.0))
                data = np.where(np.isin(data, [10, 20, 30, 40, 50, 60, 70, 80, 90, 95, 100]), remapped, data)
                data = np.where(data > 10, np.nan, data)
            else:
                data = np.where(data == no_data, np.nan, data)

            if modality not in ("biome", "eco_region", "dynamic_world", "esa_worldcover"):
                if modality == "sentinel2":
                    m_l2a = np.array(self.band_stats["sentinel2_l2a"]["mean"])[sel]
                    s_l2a = np.array(self.band_stats["sentinel2_l2a"]["std"])[sel]
                    m_l1c = np.array(self.band_stats["sentinel2_l1c"]["mean"])[sel]
                    s_l1c = np.array(self.band_stats["sentinel2_l1c"]["std"])[sel]
                    means = np.where(l2a[:, None], m_l2a[None], m_l1c[None])  # (B, C)
                    stds = np.where(l2a[:, None], s_l2a[None], s_l1c[None])
                else:
                    means = np.array(self.band_stats[modality]["mean"])[sel][None]
                    stds = np.array(self.band_stats[modality]["std"])[sel][None]
                if modality in ("era5", "lat", "lon", "month"):
                    data = (data - means) / stds
                else:
                    data = (data - means[..., None, None]) / stds[..., None, None]

            if M.MODALITY_TASK[modality] in ("classification", "segmentation"):
                data = np.where(np.isnan(data), -1, data).astype(np.int64)
            else:
                data = data.astype(np.float32)

            if self.channels_last and data.ndim == 4:
                data = np.ascontiguousarray(data.transpose(0, 2, 3, 1))
            out[modality] = data[inverse]

        out["id"] = [names[i] for i in inverse]
        return out


class HDF5StreamLoader(PackedLoader):
    """Stream training batches straight from the HDF5 — the reference's
    ``no_ffcv`` DataLoader path (mmearth_dataset.py:273-277,
    main_pretrain.py:243-252).  No packing step, no second copy of the
    dataset on disk; per-sample transforms run online on the host, so peak
    throughput is well below the packed loaders (same trade-off as the
    reference's non-FFCV path, README.md:26).  Use ``--loader hdf5`` for
    quick experiments or storage-constrained hosts; mmpack/grain for
    production runs.

    Shares PackedLoader's epoch-shuffle / sharding / drop_last / prefetch
    machinery; only the per-batch gather differs (lock-serialized — h5py
    handles are not thread-safe across the prefetch thread and stragglers)."""

    def __init__(
        self,
        dataset: MMEarthDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        indices: Sequence[int] | None = None,
        prefetch: int = 2,
    ):
        import threading

        super().__init__(
            dataset, batch_size, shuffle=shuffle, drop_last=drop_last,
            seed=seed, shard=shard, indices=indices, prefetch=prefetch,
        )
        self._read_lock = threading.Lock()

    def _prefetch_hint(self, rows: np.ndarray) -> None:
        pass  # no memmap to page in; the h5 chunk cache does its own thing

    def _gather_batch(self, rows: np.ndarray) -> dict[str, np.ndarray]:
        with self._read_lock:
            # one batched fancy-index read per modality (get_rows sorts rows
            # internally = forward-seeking IO through the h5 chunks)
            batch = self.dataset.get_rows(np.sort(rows))
        batch.pop("id")
        # int32 on the wire (pack.py parity; values fit)
        return {k: v.astype(np.int32) if v.dtype == np.int64 else v
                for k, v in batch.items()}
