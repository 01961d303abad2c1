"""End-to-end pretraining smoke tests on synthetic data (the reference's
tests/pretrain_test.py needs the real 1M-sample download; we bundle a
synthetic generator instead, SURVEY.md §4)."""
import json
from pathlib import Path

import numpy as np
import pytest

from mmearth_tpu.configs import modalities as M
from mmearth_tpu.data.mmearth import MMEarthDataset
from mmearth_tpu.data.pack import pack_split
from mmearth_tpu.data.loader import PackedDataset, PackedLoader
from mmearth_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    return generate(tmp_path_factory.mktemp("mmearth"), n=24, tile=64, seed=0)


def test_dataset_transform_parity(synth_dir):
    mods = {**M.INP_MODALITIES, **M.OUT_MODALITIES}
    ds = MMEarthDataset(synth_dir, mods, split="train")
    assert len(ds) == 21  # 24 - 24//8 val samples
    item = ds[0]
    assert item["sentinel2"].shape == (64, 64, 12) and item["sentinel2"].dtype == np.float32
    assert item["sentinel1"].shape == (64, 64, 8)
    assert item["dynamic_world"].dtype == np.int64
    dw = item["dynamic_world"]
    assert dw.min() >= -1 and dw.max() <= 8  # remap 1..9 -> 0..8, no-data -> -1
    esa = item["esa_worldcover"]
    assert esa.min() >= -1 and esa.max() <= 10  # remap 10..100 -> 0..10
    assert item["biome"].shape == (14,)
    assert item["era5"].shape == (12,)
    # z-normalized continuous data should be roughly centered
    assert abs(np.nanmean(item["sentinel2"])) < 1.0


def test_pack_and_loader(synth_dir, tmp_path):
    mods = {**M.INP_MODALITIES, **M.OUT_MODALITIES}
    ds = MMEarthDataset(synth_dir, mods, split="train")
    packed = pack_split(ds, tmp_path / "train")
    pd = PackedDataset(packed)
    assert pd.count == len(ds)
    assert pd.arrays["dynamic_world"].dtype == np.int32
    # packed rows == dataset items (guards the batched get_rows pack path)
    for i in (0, len(ds) // 2, len(ds) - 1):
        item = ds[i]
        for k in ("sentinel2", "dynamic_world", "biome", "era5"):
            np.testing.assert_array_equal(
                np.asarray(pd.arrays[k][i], dtype=np.float64),
                np.asarray(item[k], dtype=np.float64), err_msg=f"{k}[{i}]")

    loader = PackedLoader(pd, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["sentinel2"].shape == (4, 64, 64, 12)

    # per-host sharding splits samples disjointly
    l0 = PackedLoader(pd, batch_size=2, shuffle=False, drop_last=False, shard=(0, 2))
    l1 = PackedLoader(pd, batch_size=2, shuffle=False, drop_last=False, shard=(1, 2))
    n0 = sum(x["sentinel2"].shape[0] for x in l0)
    n1 = sum(x["sentinel2"].shape[0] for x in l1)
    assert n0 + n1 == pd.count

    # reshuffle across epochs
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert not np.array_equal(b["sentinel2"], b2["sentinel2"])


@pytest.mark.slow
def test_pretrain_main_smoke(synth_dir, tmp_path):
    """Two epochs of the real CLI path on CPU (reference pretrain_test.py)."""
    import main_pretrain

    parser = main_pretrain.get_args_parser()
    args = parser.parse_args(
        [
            "--data_dir", str(synth_dir),
            "--processed_dir", str(tmp_path / "proc"),
            "--output_dir", str(tmp_path / "out"),
            "--model", "convnextv2_atto",
            "--input_size", "56",
            "--patch_size", "8",
            "--batch_size", "2",
            "--epochs", "2",
            "--warmup_epochs", "1",
            "--loss_aggr", "uncertainty",
            "--use_bf16", "False",
        ]
    )
    state, history = main_pretrain.main(args)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    # checkpoints written and resumable
    ckpt_dir = tmp_path / "out" / "checkpoints"
    assert ckpt_dir.exists()

    # auto-resume: run again with more epochs, should start from epoch 2
    args.epochs = 3
    state2, history2 = main_pretrain.main(args)
    assert len(history2) == 1 and history2[0]["epoch"] == 2

    # explicit --resume <epoch dir> takes precedence over the auto-resume glob
    args.epochs = 4
    args.resume = str(tmp_path / "out" / "checkpoints" / "2")
    state3, history3 = main_pretrain.main(args)
    assert len(history3) == 1 and history3[0]["epoch"] == 3


@pytest.mark.slow
def test_pretrain_chained_dispatch(synth_dir, tmp_path):
    """--steps_per_dispatch chains k steps per device dispatch."""
    import main_pretrain

    args = main_pretrain.get_args_parser().parse_args(
        [
            "--data_dir", str(synth_dir),
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "convnextv2_atto",
            "--input_size", "56", "--patch_size", "8",
            "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "1",
            "--steps_per_dispatch", "2", "--use_bf16", "False",
        ]
    )
    state, history = main_pretrain.main(args)
    assert np.isfinite(history[0]["loss"])
    assert int(state.step) == 21 // 8  # 21 train samples, batch 8 (1 x 8 devices)


@pytest.mark.slow
def test_pretrain_grain_loader(synth_dir, tmp_path):
    """--loader grain drives the same CLI path through Grain/ArrayRecord."""
    import main_pretrain
    from mmearth_tpu.data import grain_pipeline as gp

    if not gp.have_grain():
        pytest.skip("grain not installed")
    args = main_pretrain.get_args_parser().parse_args(
        [
            "--data_dir", str(synth_dir),
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "convnextv2_atto",
            "--input_size", "56", "--patch_size", "8",
            "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "1",
            "--loader", "grain", "--use_bf16", "False",
        ]
    )
    state, history = main_pretrain.main(args)
    assert np.isfinite(history[0]["loss"])
    assert int(state.step) == 21 // 8  # same step count as the mmpack loader
    assert (tmp_path / "proc" / "train_arrayrecord" / "meta.json").exists()


@pytest.mark.slow
def test_pretrain_grain_midstream_resume(synth_dir, tmp_path):
    """A grain run killed between epochs resumes the *stream*, not the epoch:
    the checkpoint carries the Grain iterator position (loader-<epoch>.bin)
    and the resumed run continues on exactly the next sample.  Proven by
    byte-equality of the stream position after epoch 1 between an unbroken
    2-epoch run and a 1-epoch-then-resume run."""
    import main_pretrain
    from mmearth_tpu.data import grain_pipeline as gp

    if not gp.have_grain():
        pytest.skip("grain not installed")

    def run(out, epochs):
        args = main_pretrain.get_args_parser().parse_args(
            [
                "--data_dir", str(synth_dir),
                "--processed_dir", str(tmp_path / "proc_resume"),
                "--output_dir", str(out),
                "--model", "convnextv2_atto",
                "--input_size", "56", "--patch_size", "8",
                "--batch_size", "1", "--epochs", str(epochs),
                "--warmup_epochs", "1", "--loader", "grain",
                "--use_bf16", "False", "--save_ckpt_freq", "1",
            ]
        )
        return main_pretrain.main(args)

    run(tmp_path / "A", 2)                     # unbroken 2-epoch run
    run(tmp_path / "B", 1)                     # "killed" after epoch 0
    state, history = run(tmp_path / "B", 2)    # auto-resume -> epoch 1
    assert len(history) == 1 and history[0]["epoch"] == 1

    a = (tmp_path / "A" / "checkpoints" / "loader-1.bin").read_bytes()
    b = (tmp_path / "B" / "checkpoints" / "loader-1.bin").read_bytes()
    assert a == b, "resumed run's stream position diverged from the unbroken run"


def test_loader_state_files_are_per_process(tmp_path, monkeypatch):
    """On a pod every process owns a per-host sharded Grain stream, so each
    must save and restore its OWN position file; restoring process 0's state
    everywhere would replay wrong shards after a resume."""
    import jax

    from mmearth_tpu.checkpoints import orbax_io

    root = tmp_path / "checkpoints"
    root.mkdir()

    def at(idx):
        monkeypatch.setattr(jax, "process_index", lambda: idx)

    at(0)
    assert orbax_io._loader_file(3) == "loader-3.bin"  # single-host name kept
    (root / orbax_io._loader_file(3)).write_bytes(b"p0-state")
    at(1)
    assert orbax_io._loader_file(3) == "loader-3-p1.bin"
    (root / orbax_io._loader_file(3)).write_bytes(b"p1-state")

    # each process resolves its own file, for both resume paths
    at(0)
    assert orbax_io.find_loader_state(tmp_path, 3) == b"p0-state"
    at(1)
    assert orbax_io.find_loader_state(tmp_path, 3) == b"p1-state"
