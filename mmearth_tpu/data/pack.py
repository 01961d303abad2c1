"""Offline packer: MMEarth HDF5 -> flat memory-mapped tensors ("mmpack").

The FFCV-beton equivalent (reference mmearth_dataset.py:252-318,321-373): all
per-sample transforms (band select, label remap, z-norm, dtype cast, HWC
layout) run once offline; the training loader then does nothing but gather
rows from memory-mapped files — the host stays out of the hot path, which is
what the TPU input pipeline needs (single host core feeding a v5e chip).

Layout of a packed split directory::

    <out>/<split>/meta.json          # {"count": N, "fields": {name: {shape, dtype}}}
    <out>/<split>/<modality>.bin     # raw C-order [N, *shape] array

Labels are stored int32 (values fit; TPU-native integer width).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

from .mmearth import MMEarthDataset


def pack_split(
    dataset: MMEarthDataset,
    out_dir: Path | str,
    indices: Sequence[int] | None = None,
    log_every: int = 10000,
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idxs = range(len(dataset)) if indices is None else list(indices)
    n = len(idxs)
    assert n > 0, "cannot pack an empty split"

    sample = dataset[idxs[0] if indices is not None else 0]
    fields = {}
    writers = {}
    for name, arr in sample.items():
        if name == "id":
            continue
        dtype = np.int32 if arr.dtype == np.int64 else arr.dtype
        fields[name] = {"shape": list(arr.shape), "dtype": np.dtype(dtype).name}
        writers[name] = np.lib.format.open_memmap(
            out_dir / f"{name}.bin", mode="w+", dtype=dtype, shape=(n, *arr.shape)
        )

    ids = []
    if hasattr(dataset, "get_rows"):
        # batched fancy-index reads + vectorized transforms (~3x, see
        # MMEarthDataset.get_rows)
        chunk = 256
        idxs = np.asarray(list(idxs))
        logged = 0
        for start in range(0, n, chunk):
            pos = idxs[start : start + chunk]
            batch = dataset.get_rows(pos)
            ids.extend(batch.pop("id"))
            for name, arr in batch.items():
                writers[name][start : start + len(pos)] = arr
            written = start + len(pos)
            if log_every and written // log_every > logged:
                logged = written // log_every
                print(f"packed {written}/{n}")
    else:
        for row, idx in enumerate(idxs):
            item = dataset[idx]
            ids.append(item.pop("id"))
            for name, arr in item.items():
                writers[name][row] = arr
            if log_every and row and row % log_every == 0:
                print(f"packed {row}/{n}")
    for w in writers.values():
        w.flush()

    (out_dir / "meta.json").write_text(json.dumps({"count": n, "fields": fields}))
    (out_dir / "ids.json").write_text(json.dumps(ids))
    return out_dir


def pack_mmearth(
    data_dir: Path | str,
    processed_dir: Path | str,
    modalities,
    splits: Sequence[str] = ("train",),
    indices: Sequence[Sequence[int]] | None = None,
) -> list[Path]:
    """Pack one or more splits if not already packed (mirrors the lazy beton
    conversion in get_mmearth_dataloaders, mmearth_dataset.py:279-298)."""
    out = []
    for i, split in enumerate(splits):
        dest = Path(processed_dir) / (split + ("_subset" if indices is not None else ""))
        if not (dest / "meta.json").exists():
            ds = MMEarthDataset(data_dir, modalities, split=split)
            if len(ds) == 0:
                assert split != "train", "training dataset has no samples"
                out.append(None)
                continue
            print(f"packing split {split!r} -> {dest}")
            pack_split(ds, dest, indices=None if indices is None else indices[i])
        out.append(dest)
    return out


def main():
    import argparse

    from ..configs import modalities as M

    ap = argparse.ArgumentParser(description="Pack MMEarth HDF5 into mmpack format")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--splits", nargs="+", default=["train"])
    ap.add_argument("--modalities", choices=["default", "rgb", "inp_only"], default="default")
    args = ap.parse_args()
    pack_mmearth(args.data_dir, args.out, M.modality_preset(args.modalities),
                 splits=args.splits)


if __name__ == "__main__":
    main()
