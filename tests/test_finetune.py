"""Finetune stack: UNet shapes, metrics parity vs torch, criteria parity, and
end-to-end finetune smoke over all six GEO-Bench datasets on synthetic data
(reference tests/finetune_test.py, without the geobench download)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mmearth_tpu.data.geobench import (
    NUM_CLASSES,
    TASK_CLASS,
    generate_synthetic_geobench,
)
from mmearth_tpu.data.loader import PackedDataset, PackedLoader
from mmearth_tpu.eval import metrics as M
from mmearth_tpu.losses import finetune as fl
from mmearth_tpu.models import unet as unet_lib

DATASETS = list(NUM_CLASSES)


def test_unet_shapes():
    model = unet_lib.convnextv2_unet_atto(img_size=64, patch_size=8, in_chans=12, num_classes=7)
    x = jnp.zeros((2, 64, 64, 12))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 64, 64, 7)
    # patch-16 geometry too (stem stride 2)
    model16 = unet_lib.convnextv2_unet_atto(img_size=32, patch_size=16, in_chans=12, num_classes=7)
    x16 = jnp.zeros((2, 32, 32, 12))
    params16 = model16.init(jax.random.PRNGKey(0), x16)["params"]
    assert model16.apply({"params": params16}, x16).shape == (2, 32, 32, 7)


def test_smoothed_ce_matches_timm_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    s = 0.2
    ours = float(fl.smoothed_cross_entropy(jnp.array(logits), jnp.array(labels), s))
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    nll = -lp[torch.arange(8), torch.from_numpy(labels)]
    golden = ((1 - s) * nll + s * (-lp.mean(dim=-1))).mean().item()
    assert abs(ours - golden) < 1e-5


def test_smoothed_bce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 43)).astype(np.float32)
    target = (rng.random((8, 43)) < 0.3).astype(np.float32)
    s = 0.2
    ours = float(fl.smoothed_binary_cross_entropy(jnp.array(logits), jnp.array(target), s))
    t = torch.from_numpy(target) * (1 - s) + (1 - torch.from_numpy(target)) * s
    golden = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), t).item()
    assert abs(ours - golden) < 1e-5


def test_metrics_match_reference_semantics():
    rng = np.random.default_rng(2)
    # accuracy
    logits = rng.normal(size=(100, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 100)
    m = M.MulticlassAccuracy(10)
    m.update(logits[:50], labels[:50])
    m.update(logits[50:], labels[50:])
    assert m.compute() == (logits.argmax(-1) == labels).mean()

    # multilabel F1 micro
    logits = rng.normal(size=(60, 43)).astype(np.float32)
    labels = (rng.random((60, 43)) < 0.3).astype(np.int64)
    f1 = M.MultilabelF1Micro(43)
    f1.update(logits, labels)
    preds = logits > 0
    tp = (preds & (labels > 0)).sum()
    fp = (preds & (labels == 0)).sum()
    fn = (~preds & (labels > 0)).sum()
    assert abs(f1.compute() - 2 * tp / (2 * tp + fp + fn)) < 1e-9

    # jaccard macro against sklearn-style manual computation
    C = 5
    logits = rng.normal(size=(1000, C)).astype(np.float32)
    labels = rng.integers(0, C, 1000)
    jac = M.MulticlassJaccardMacro(C)
    jac.update(logits, labels)
    preds = logits.argmax(-1)
    ious = []
    for c in range(C):
        inter = ((preds == c) & (labels == c)).sum()
        union = ((preds == c) | (labels == c)).sum()
        if union:
            ious.append(inter / union)
    assert abs(jac.compute() - np.mean(ious)) < 1e-9


def test_device_stats_equal_host_updates():
    rng = np.random.default_rng(3)
    for ds in ("m-eurosat", "m-bigearthnet", "m-cashew-plant"):
        C = NUM_CLASSES[ds]
        if TASK_CLASS[ds] == "multi_label_classification":
            logits = rng.normal(size=(16, C)).astype(np.float32)
            labels = (rng.random((16, C)) < 0.3).astype(np.int64)
        elif TASK_CLASS[ds] == "segmentation":
            logits = rng.normal(size=(4, 8, 8, C)).astype(np.float32)
            labels = rng.integers(0, C, (4, 8, 8))
        else:
            logits = rng.normal(size=(16, C)).astype(np.float32)
            labels = rng.integers(0, C, 16)
        _, host = M.metric_for(ds, C)
        host.update(logits, labels)
        stats = jax.jit(M.batch_stats_fn(ds, C))(jnp.array(logits), jnp.array(labels))
        _, dev = M.metric_for(ds, C)
        dev.update_stats(jax.tree_util.tree_map(np.asarray, stats))
        assert abs(host.compute() - dev.compute()) < 1e-9, ds


@pytest.mark.slow
@pytest.mark.parametrize("dataset", DATASETS)
def test_finetune_e2e(dataset, tmp_path):
    """Two-epoch finetune on synthetic packed data through the CLI path."""
    import main_finetune

    generate_synthetic_geobench(tmp_path / "proc", dataset, n_per_split=(32, 8, 8))
    is_seg = TASK_CLASS[dataset] == "segmentation"
    args = main_finetune.get_args_parser().parse_args(
        [
            "--data_set", dataset,
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "convnextv2_unet_atto" if is_seg else "convnextv2_atto",
            "--input_size", "64",
            "--patch_size", "8",
            "--batch_size", "1",
            "--epochs", "2",
            "--linear_probe", "True" if is_seg else "False",
            "--use_bf16", "False",
            "--layer_decay", "0.9",
            "--smoothing", "0.2" if not is_seg else "0.0",
        ]
    )
    result = main_finetune.main(args)
    assert len(result["history"]) == 2
    assert all(np.isfinite(h["loss"]) for h in result["history"])
    name = [k for k in result if k.startswith("test_")][0]
    assert result[name] is not None and 0.0 <= result[name] <= 1.0


@pytest.mark.slow
def test_probe_freezes_encoder(tmp_path):
    """Linear probe must leave every non-head parameter bit-identical."""
    import main_finetune

    generate_synthetic_geobench(tmp_path / "proc", "m-eurosat", n_per_split=(32, 8, 8))
    args = main_finetune.get_args_parser().parse_args(
        [
            "--data_set", "m-eurosat",
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "convnextv2_atto",
            "--input_size", "64", "--patch_size", "8",
            "--batch_size", "4", "--epochs", "1",
            "--linear_probe", "True", "--use_bf16", "False",
        ]
    )
    from main_finetune import config_from_args
    from mmearth_tpu.train.finetune import run_finetune

    cfg = config_from_args(args)
    out = run_finetune(cfg)
    state = out["state"]
    # head must have moved; everything else must be exactly at init.  Re-init
    # the model with the same seed to compare.
    from mmearth_tpu.train.finetune import build_finetune_model

    model = build_finetune_model(cfg, 12, 10)
    # jit vs eager init RNG lowering differs by ~1e-8; real training drift is
    # ~1e-3, so a 1e-6 tolerance still catches an unfrozen encoder.
    init_params = model.init(jax.random.PRNGKey(cfg.run.seed), jnp.zeros((2, 64, 64, 12)))["params"]
    for key in init_params:
        if key == "head":
            continue
        a = jax.tree_util.tree_leaves(init_params[key])
        b = jax.tree_util.tree_leaves(state.params[key])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6, err_msg=key)


@pytest.mark.slow
def test_resnet_baseline_e2e(tmp_path):
    """ResNet baseline path (reference main_finetune.py:478-501 torchvision
    baselines): trains with BatchNorm state threading."""
    import main_finetune

    generate_synthetic_geobench(tmp_path / "proc", "m-eurosat", n_per_split=(32, 8, 8))
    args = main_finetune.get_args_parser().parse_args(
        [
            "--data_set", "m-eurosat",
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "resnet18",
            "--batch_size", "1", "--epochs", "1",
            "--use_bf16", "False", "--drop_path", "0.0",
        ]
    )
    result = main_finetune.main(args)
    assert np.isfinite(result["history"][0]["loss"])
    assert result["test_Accuracy"] is not None


@pytest.mark.slow
def test_finetune_auto_resume(tmp_path):
    """Auto-resume restores the latest epoch (reference auto_load_model)."""
    import main_finetune

    generate_synthetic_geobench(tmp_path / "proc", "m-eurosat", n_per_split=(32, 8, 8))
    argv = [
        "--data_set", "m-eurosat",
        "--processed_dir", str(tmp_path / "proc"),
        "--output_dir", str(tmp_path / "out"),
        "--model", "convnextv2_atto",
        "--input_size", "64", "--patch_size", "8",
        "--batch_size", "1", "--epochs", "2", "--use_bf16", "False",
    ]
    r1 = main_finetune.main(main_finetune.get_args_parser().parse_args(argv))
    assert [h["epoch"] for h in r1["history"]] == [0, 1]

    argv[argv.index("--epochs") + 1] = "3"
    r2 = main_finetune.main(main_finetune.get_args_parser().parse_args(argv))
    assert [h["epoch"] for h in r2["history"]] == [2]


@pytest.mark.slow
def test_finetune_logging_and_disk_test_eval(tmp_path, monkeypatch):
    """Round-4 items 3+8: --wandb/--log_dir/log.txt are live (reference
    main_finetune.py:680-704 wandb + log.txt; log_writer is always None
    there) and the final test eval reloads the saved last-epoch checkpoint
    from disk (main_finetune.py:712-758), scoring identically to the
    in-memory params."""
    import json

    import main_finetune
    from mmearth_tpu.data.geobench import get_geobench_dataloaders
    from mmearth_tpu.train import finetune as ft

    wandb_logged = []

    class FakeWandb:
        def log(self, d):
            wandb_logged.append(d)

        def finish(self):
            pass

    monkeypatch.setattr(
        ft, "maybe_wandb", lambda enabled, *a, **k: FakeWandb() if enabled else None
    )

    generate_synthetic_geobench(tmp_path / "proc", "m-eurosat", n_per_split=(16, 8, 8))
    loaders, task = get_geobench_dataloaders(
        # global batch 8 = 1 per device on the 8-device CPU sim
        "m-eurosat", tmp_path / "proc", 0, 8, splits=("train", "val", "test"),
    )
    args = main_finetune.get_args_parser().parse_args(
        [
            "--data_set", "m-eurosat",
            "--processed_dir", str(tmp_path / "proc"),
            "--output_dir", str(tmp_path / "out"),
            "--log_dir", str(tmp_path / "tb"),
            "--wandb", "True",
            "--model", "convnextv2_atto",
            "--input_size", "64", "--patch_size", "8",
            "--batch_size", "1", "--epochs", "2", "--use_bf16", "False",
        ]
    )
    result = main_finetune.main(args, loaders=loaders, task=task)

    # wandb payload per epoch with the reference's log_stats keys
    assert len(wandb_logged) == 2
    for epoch, d in enumerate(wandb_logged):
        assert d["epoch"] == epoch
        assert {"train_loss", "train_lr", "test_Accuracy", "n_parameters"} <= set(d)
    # log.txt: one JSON line per epoch, identical payloads
    lines = (tmp_path / "out" / "log.txt").read_text().strip().splitlines()
    assert [json.loads(ln) for ln in lines] == wandb_logged
    # tensorboard event files exist under --log_dir
    assert any((tmp_path / "tb").rglob("events.*"))

    # test eval came from the restored disk checkpoint...
    assert result["test_params_from"].startswith("disk")
    # ...and matches the in-memory params' score exactly
    model = ft.build_finetune_model(
        main_finetune.config_from_args(args), 12, task.num_classes
    )
    from mmearth_tpu.eval.metrics import batch_stats_fn, metric_for

    eval_fn = jax.jit(ft.make_eval_step(model, batch_stats_fn("m-eurosat", task.num_classes)))
    _, metric = metric_for("m-eurosat", task.num_classes)
    mem_score = ft.evaluate(result["state"].params, loaders[2], eval_fn, metric)
    assert mem_score == result["test_Accuracy"]
