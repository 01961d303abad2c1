"""Synthetic MMEarth dataset generator.

Writes a directory with the exact on-disk layout the reference consumes
(mmearth_dataset.py:163-177): ``data_*.h5`` with per-modality datasets +
``metadata``, plus the splits / tile-info / band-stats JSON sidecars.  Used as
the test fixture (no 1M-sample download) and for benchmarking; the reference
repo has no such fixture (SURVEY.md §4).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def generate(out_dir: Path | str, n: int = 64, tile: int = 64, seed: int = 0, name: str = "data_synth") -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    import h5py

    h5_path = out_dir / f"{name}.h5"
    names = [f"tile_{i:06d}" for i in range(n)]
    with h5py.File(h5_path, "w") as f:
        # continuous pixel modalities (raw, pre-normalization units)
        f["sentinel2"] = (rng.normal(2000, 800, size=(n, 13, tile, tile))).astype(np.uint16)
        f["sentinel1"] = rng.normal(-10, 4, size=(n, 8, tile, tile)).astype(np.float32)
        f["aster"] = rng.normal(500, 300, size=(n, 2, tile, tile)).astype(np.float32)
        canopy = rng.integers(0, 60, size=(n, 2, tile, tile)).astype(np.uint8)
        canopy[rng.random(canopy.shape) < 0.02] = 255  # no-data speckle
        f["canopy_height_eth"] = canopy
        # categorical pixel modalities (raw label values incl. no-data)
        f["dynamic_world"] = rng.integers(0, 10, size=(n, 1, tile, tile)).astype(np.uint8)
        esa_vals = np.array([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 95, 100], dtype=np.uint8)
        f["esa_worldcover"] = esa_vals[rng.integers(0, len(esa_vals), size=(n, 1, tile, tile))]
        # image-level
        era5 = rng.normal(280, 15, size=(n, 12)).astype(np.float32)
        era5[rng.random(era5.shape) < 0.05] = np.nan
        f["era5"] = era5
        f["lat"] = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        f["lon"] = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        f["month"] = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        f["biome"] = np.eye(14, dtype=np.uint8)[rng.integers(0, 14, n)]
        f["eco_region"] = np.eye(846, dtype=np.uint8)[rng.integers(0, 846, n)]
        meta = np.array([(s.encode(),) for s in names], dtype=np.dtype([("name", "S32")]))
        f["metadata"] = meta

    n_val = max(1, n // 8)
    splits = {"train": list(range(n - n_val)), "val": list(range(n - n_val, n))}
    (out_dir / f"{name}_splits.json").write_text(json.dumps(splits))

    tile_info = {s: {"S2_type": "l2a" if i % 2 == 0 else "l1c"} for i, s in enumerate(names)}
    (out_dir / f"{name}_tile_info.json").write_text(json.dumps(tile_info))

    def stats(mean, std, k):
        return {"mean": [float(mean)] * k, "std": [float(std)] * k}

    band_stats = {
        "sentinel2_l2a": stats(2000, 800, 13),
        "sentinel2_l1c": stats(2100, 850, 13),
        "sentinel1": stats(-10, 4, 8),
        "aster": stats(500, 300, 2),
        "canopy_height_eth": stats(10, 10, 2),
        "era5": stats(280, 15, 12),
        "lat": stats(0, 0.7, 2),
        "lon": stats(0, 0.7, 2),
        "month": stats(0, 0.7, 2),
    }
    (out_dir / f"{name}_band_stats.json").write_text(json.dumps(band_stats))
    return out_dir


def main():
    ap = argparse.ArgumentParser(description="Generate a synthetic MMEarth dataset directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    path = generate(args.out, n=args.n, tile=args.tile, seed=args.seed)
    print(f"wrote synthetic MMEarth dataset to {path}")


if __name__ == "__main__":
    main()
