#!/usr/bin/env python
"""Data-pipeline walkthrough (reference examples/data_loader_example.ipynb).

Generates a synthetic MMEarth directory, reads it with the exact-transform
HDF5 dataset, packs it into the mmpack format, and iterates batches through
the memory-mapped loader with the native gather core.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from mmearth_tpu.configs import modalities as M
from mmearth_tpu.data import MMEarthDataset, PackedDataset, PackedLoader, pack_split
from mmearth_tpu.data.synthetic import generate

root = generate("/tmp/mmearth_example", n=32, tile=64)
print(f"synthetic MMEarth at {root}")

mods = {**M.INP_MODALITIES, **M.OUT_MODALITIES}
ds = MMEarthDataset(root, mods, split="train")
item = ds[0]
for k, v in item.items():
    print(f"  {k:20s} {getattr(v, 'shape', v)} {getattr(v, 'dtype', '')}")

packed = pack_split(ds, "/tmp/mmearth_example_packed/train")
loader = PackedLoader(PackedDataset(packed), batch_size=8, seed=0)
for batch in loader:
    print("batch:", {k: v.shape for k, v in list(batch.items())[:3]}, "...")
    break
