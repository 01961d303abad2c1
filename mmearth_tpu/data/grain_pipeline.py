"""Grain/ArrayRecord input pipeline — the cloud-storage alternative to mmpack.

The mmpack loader (data/loader.py) memory-maps flat tensors on local disk —
ideal for a single host with fast local storage.  For TPU-pod training off
network filesystems / object stores, the TPU-ecosystem answer is Grain over
ArrayRecord shards: parallel record-level reads, deterministic global shuffle
from a seed, per-process sharding that composes with ``jax.process_index()``,
and — unlike the reference's FFCV loader (mmearth_dataset.py:300-316) — a
*checkpointable iterator*: ``GrainLoader.get_state()`` round-trips through the
Orbax checkpoint alongside model state, so a resumed run continues mid-epoch
on exactly the next sample (the reference restarts the epoch on resume,
helpers.py:568-610).

Record format: one sample per record, serialized as an uncompressed ``.npz``
(self-describing name->array archive); all mmearth transforms (band select,
label remap, z-norm, dtype, HWC) are applied before packing, exactly as in
data/pack.py, so training-time decode is a zero-copy ``np.load`` per field.
"""
from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Iterator, Mapping, Sequence

import numpy as np

__all__ = [
    "pack_arrayrecord",
    "GrainLoader",
    "have_grain",
]


def have_grain() -> bool:
    try:
        import grain.python  # noqa: F401
        from array_record.python import array_record_module  # noqa: F401

        return True
    except Exception:
        return False


def _encode_sample(sample: Mapping[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in sample.items()})
    return buf.getvalue()


def _decode_sample(data: bytes) -> dict[str, np.ndarray]:
    with np.load(io.BytesIO(bytes(data))) as z:
        return {k: z[k] for k in z.files}


def _stack_records(recs: Sequence[Mapping[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {k: np.stack([r[k] for r in recs]) for k in recs[0]}


def pack_arrayrecord(
    dataset,
    out_dir: Path | str,
    indices: Sequence[int] | None = None,
    shard_size: int = 4096,
    log_every: int = 10000,
) -> Path:
    """Pack an indexable sample-dict dataset (e.g. MMEarthDataset or a list)
    into ArrayRecord shards: ``<out>/mmearth-NNNNN.array_record`` + meta.json.

    Like data/pack.py, int64 labels are narrowed to int32 and the ``id``
    field is kept out of the tensor record (stored in meta.json order).
    """
    from array_record.python.array_record_module import ArrayRecordWriter

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idxs = list(range(len(dataset))) if indices is None else list(indices)
    n = len(idxs)
    assert n > 0, "cannot pack an empty split"

    def iter_items():
        if hasattr(dataset, "get_rows"):  # batched reads (see MMEarthDataset)
            arr = np.asarray(idxs)
            for start in range(0, n, 256):
                batch = dataset.get_rows(arr[start : start + 256])
                batch_ids = batch.pop("id")
                for i, sid in enumerate(batch_ids):
                    yield str(sid), {k: v[i] for k, v in batch.items()}
        else:
            for idx in idxs:
                item = dict(dataset[idx])
                yield str(item.pop("id", idx)), item

    ids: list = []
    shard_paths: list[str] = []
    writer = None
    fields: dict | None = None
    for row, (sample_id, item) in enumerate(iter_items()):
        ids.append(sample_id)
        item = {
            k: (v.astype(np.int32) if getattr(v, "dtype", None) == np.int64 else np.asarray(v))
            for k, v in item.items()
        }
        if fields is None:
            fields = {
                k: {"shape": list(v.shape), "dtype": v.dtype.name} for k, v in item.items()
            }
        if writer is None:
            path = out_dir / f"mmearth-{len(shard_paths):05d}.array_record"
            shard_paths.append(path.name)
            writer = ArrayRecordWriter(str(path), "group_size:1")
        writer.write(_encode_sample(item))
        if (row + 1) % shard_size == 0:
            writer.close()
            writer = None
        if log_every and row and row % log_every == 0:
            print(f"packed {row}/{n}")
    if writer is not None:
        writer.close()

    meta = {"count": n, "fields": fields, "shards": shard_paths, "ids": ids}
    (out_dir / "meta.json").write_text(json.dumps(meta))
    return out_dir


class GrainLoader:
    """Iterable over batches of numpy dicts, backed by Grain + ArrayRecord.

    Interface mirrors ``PackedLoader`` (batch dicts, ``set_epoch``,
    ``len(loader)``) so the training drivers can swap loaders; adds
    ``get_state()/set_state()`` for mid-epoch checkpoint/resume.

    Two access modes (don't mix them in one run):
      * ``for batch in loader`` — one exact epoch per pass: every shard
        record exactly once, partial final batch iff ``drop_last=False``,
        per-epoch reshuffle keyed by ``set_epoch`` (seed + epoch), matching
        ``PackedLoader``/DistributedSampler semantics.
      * ``loader.iterator()`` — a continuous stream whose position
        round-trips through ``get_state()/set_state()`` (mid-epoch resume;
        FFCV and the reference restart the epoch instead).

    ``shard=(index, count)`` splits records across processes (equivalent to
    the reference's DistributedSampler, main_pretrain.py:301-310).
    """

    def __init__(
        self,
        path: Path | str,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        worker_count: int = 0,
        read_threads: int = 2,
    ):
        import grain.python as pg

        self._pg = pg
        self.path = Path(path)
        meta = json.loads((self.path / "meta.json").read_text())
        self.count: int = meta["count"]
        self.fields: dict = meta["fields"]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.worker_count = worker_count
        self.read_threads = read_threads
        shard_files = [str(self.path / s) for s in meta["shards"]]
        self._source = pg.ArrayRecordDataSource(shard_files)
        self._it = None
        self._raw = None
        self._pos = 0  # records consumed in the current shuffle epoch (stream mode)
        self.epoch = 0

    def _make_loader(self, num_epochs, seed):
        pg = self._pg
        rank, world = self.shard

        class _Decode(pg.MapTransform):
            def map(self, record):
                return _decode_sample(record)

        sampler = pg.IndexSampler(
            num_records=self.count,
            shard_options=pg.ShardOptions(
                shard_index=rank, shard_count=world, drop_remainder=self.drop_last
            ),
            shuffle=self.shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        # Workers decode records only; batching happens in the parent
        # (_stack_records).  Putting pg.Batch in the worker ops would batch
        # each worker's slice independently — every worker drops its own
        # remainder under drop_remainder, silently losing up to
        # worker_count*(batch_size-1) records per epoch and breaking
        # "every shard record exactly once".
        return pg.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[_Decode()],
            worker_count=max(self.worker_count, 0),
            read_options=pg.ReadOptions(
                num_threads=self.read_threads, prefetch_buffer_size=8 * max(self.batch_size, 1)
            ),
        )

    # -- PackedLoader-compatible surface ------------------------------------
    def set_epoch(self, epoch: int):
        """Per-epoch reshuffle (DistributedSampler.set_epoch parity): the
        next ``__iter__`` pass samples with seed ``seed + epoch``."""
        self.epoch = epoch

    def _per_shard(self) -> int:
        rank, world = self.shard
        if self.drop_last:
            return self.count // world
        return self.count // world + (1 if rank < self.count % world else 0)

    def __len__(self):
        per_shard = self._per_shard()
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        buf: list[dict] = []
        for rec in self._make_loader(num_epochs=1, seed=self.seed + self.epoch):
            buf.append(rec)
            if len(buf) == self.batch_size:
                yield _stack_records(buf)
                buf = []
        if buf and not self.drop_last:
            yield _stack_records(buf)

    # -- checkpointable continuous iterator ---------------------------------
    def iterator(self):
        """The persistent continuous *batch* iterator (epochs advance inside
        the sampler).  Its position round-trips via get/set_state: the
        batching wrapper pulls records lazily, so between batches the
        underlying Grain iterator sits exactly at the last emitted record."""
        if self._it is None:
            self._raw = iter(self._make_loader(num_epochs=None, seed=self.seed))
            self._it = self._batched(self._raw)
        return self._it

    def _batched(self, rec_it) -> Iterator[dict[str, np.ndarray]]:
        """Batch the continuous record stream, aligned to shuffle epochs.

        The sampler reshuffles every ``per_shard`` records while the driver
        consumes ``len(loader) * batch_size`` per epoch; when ``per_shard``
        is not a batch multiple those windows would drift, letting one batch
        mix two shuffle orders and a driver epoch see a record twice (tail
        of permutation e + head of permutation e+1).  So at every shuffle-
        epoch boundary the tail partial batch is dropped under ``drop_last``
        (exactly what PackedLoader / torch DataLoader drop) or emitted
        otherwise — a driver epoch is always the leading full batches of one
        permutation.
        """
        per_epoch = self._per_shard()
        buf = []
        for rec in rec_it:
            buf.append(rec)
            self._pos += 1
            if len(buf) == self.batch_size:
                yield _stack_records(buf)
                buf = []
            if self._pos >= per_epoch:
                if buf and not self.drop_last:
                    yield _stack_records(buf)
                buf = []
                self._pos = 0
        if buf and not self.drop_last:
            yield _stack_records(buf)

    def get_state(self) -> bytes:
        """Stream position as opaque bytes: the Grain iterator state plus the
        in-shuffle-epoch record count (needed so a resumed stream keeps the
        epoch-boundary alignment of :meth:`_batched`)."""
        self.iterator()
        return json.dumps({
            "mmearth_pos": self._pos,
            "grain": self._raw.get_state().decode("utf-8"),
        }).encode("utf-8")

    def set_state(self, state: bytes) -> None:
        self.iterator()
        try:
            obj = json.loads(state.decode("utf-8"))
        except Exception:
            obj = None
        if isinstance(obj, dict) and "mmearth_pos" in obj:
            self._pos = int(obj["mmearth_pos"])
            self._raw.set_state(obj["grain"].encode("utf-8"))
        else:  # legacy layout: bare Grain iterator state
            self._raw.set_state(state)


def main():
    """Offline packing CLI: python -m mmearth_tpu.data.grain_pipeline
    (the grain-side counterpart of data/pack.py's mmpack CLI)."""
    import argparse

    from ..configs import modalities as M
    from .mmearth import MMEarthDataset

    ap = argparse.ArgumentParser(description="Pack MMEarth HDF5 into ArrayRecord shards")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--splits", nargs="+", default=["train"])
    ap.add_argument("--modalities", choices=["default", "rgb", "inp_only"], default="default")
    ap.add_argument("--shard_size", type=int, default=4096)
    args = ap.parse_args()
    mods = M.modality_preset(args.modalities)

    for split in args.splits:
        ds = MMEarthDataset(args.data_dir, mods, split=split)
        if len(ds) == 0:
            # empty non-train splits are skipped, like pack_mmearth
            assert split != "train", "training dataset has no samples"
            print(f"split {split!r} is empty; skipping")
            continue
        dest = Path(args.out) / f"{split}_arrayrecord"
        print(f"packing split {split!r} ({len(ds)} samples) -> {dest}")
        pack_arrayrecord(ds, dest, shard_size=args.shard_size)


if __name__ == "__main__":
    main()
