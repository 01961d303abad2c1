"""Training loader over the mmpack format.

Replaces ffcv.Loader (reference mmearth_dataset.py:300-316): shuffled epochs,
drop_last, per-host sharding (the DistributedSampler / FFCV ``distributed=``
equivalent, SURVEY.md §2.3), and background prefetch so host gather overlaps
device compute.  Rows are gathered from memory-mapped files — no per-sample
Python transform runs at training time (all transforms were applied offline by
:mod:`mmearth_tpu.data.pack`).
"""
from __future__ import annotations

import json
import queue
import threading
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from . import native


class PackedDataset:
    def __init__(self, path: Path | str):
        self.path = Path(path)
        meta = json.loads((self.path / "meta.json").read_text())
        self.count: int = meta["count"]
        self.fields: dict = meta["fields"]
        self.arrays = {
            name: np.lib.format.open_memmap(self.path / f"{name}.bin", mode="r")
            for name in self.fields
        }

    def __len__(self):
        return self.count

    def gather(self, rows: np.ndarray) -> dict[str, np.ndarray]:
        return {name: native.gather_rows(arr, rows) for name, arr in self.arrays.items()}

    def prefetch(self, rows: np.ndarray) -> None:
        """Hint the OS to page in an upcoming batch's rows."""
        for arr in self.arrays.values():
            native.prefetch_rows(arr, rows)


class PackedLoader:
    """Iterable over batches of numpy dicts.

    Parameters mirror the reference loader: ``shuffle`` for RANDOM vs
    SEQUENTIAL order, ``drop_last`` for training.  ``shard=(index, count)``
    statically splits samples across hosts.  ``num_epochs=None`` iterates one
    epoch per ``__iter__`` call.
    """

    def __init__(
        self,
        dataset: PackedDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        indices: Sequence[int] | None = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.base_indices = (
            np.arange(dataset.count) if indices is None else np.asarray(indices)
        )
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (DistributedSampler.set_epoch parity,
        main_pretrain.py:337-338)."""
        self.epoch = epoch

    def _epoch_batches(self) -> list[np.ndarray]:
        idx = self.base_indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        rank, world = self.shard
        idx = idx[rank::world]
        n_batches = len(idx) // self.batch_size
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)
        ]
        if not self.drop_last and n_batches * self.batch_size < len(idx):
            batches.append(idx[n_batches * self.batch_size :])
        return batches

    def __len__(self):
        return len(self._epoch_batches())

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        batches = self._epoch_batches()
        if self.prefetch <= 0:
            for rows in batches:
                yield self.dataset.gather(np.sort(rows))
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            for bi, rows in enumerate(batches):
                if stop.is_set():
                    return
                if bi + 1 < len(batches):
                    self.dataset.prefetch(np.sort(batches[bi + 1]))
                # sorted gather = sequential-ish reads from the memmap
                q.put(self.dataset.gather(np.sort(rows)))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
