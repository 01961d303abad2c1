"""The central user workflow, chained end-to-end: MP-MAE pretrain on
synthetic MMEarth -> Orbax checkpoint -> GEO-Bench linear probe / UNet
segmentation probe bootstrapped from it via ``--finetune`` (reference:
main_pretrain.py then main_finetune.py:503 -> helpers.load_custom_checkpoint)."""
from pathlib import Path

import jax
import numpy as np
import pytest

from mmearth_tpu.data.geobench import generate_synthetic_geobench
from mmearth_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def pretrain_ckpt(tmp_path_factory):
    """One epoch of atto 56-8 pretraining on synthetic data -> step-0 ckpt."""
    import main_pretrain

    root = tmp_path_factory.mktemp("chain")
    mmearth = generate(root / "mmearth", n=24, tile=64, seed=0)
    pargs = main_pretrain.get_args_parser().parse_args([
        "--data_dir", str(mmearth),
        "--processed_dir", str(root / "proc"),
        "--output_dir", str(root / "pt"),
        "--model", "convnextv2_atto",
        "--input_size", "56", "--patch_size", "8",
        "--batch_size", "2", "--epochs", "1", "--warmup_epochs", "1",
        "--use_bf16", "False",
    ])
    main_pretrain.main(pargs)
    ckpt = root / "pt" / "checkpoints" / "0"
    assert ckpt.exists()
    return ckpt


def _stem_kernel(tree) -> np.ndarray:
    return np.asarray(
        tree["initial_conv"]["kernel"] if "initial_conv" in tree
        else jax.tree_util.tree_leaves(tree)[0])


@pytest.mark.slow
def test_pretrain_then_linear_probe(pretrain_ckpt, tmp_path):
    import main_finetune
    from mmearth_tpu.checkpoints.load_pretrained import encoder_tree_from_checkpoint

    stem_kernel = _stem_kernel(encoder_tree_from_checkpoint(pretrain_ckpt, depths=(2, 2, 6, 2)))

    generate_synthetic_geobench(tmp_path / "gb", "m-eurosat", n_per_split=(32, 8, 8))
    fargs = main_finetune.get_args_parser().parse_args([
        "--data_set", "m-eurosat",
        "--processed_dir", str(tmp_path / "gb"),
        "--finetune", str(pretrain_ckpt),
        "--model", "convnextv2_atto",
        "--input_size", "64", "--patch_size", "8",
        "--batch_size", "1", "--epochs", "2",
        "--linear_probe", "True", "--blr", "1e-2",
        "--use_bf16", "False",
        "--output_dir", str(tmp_path / "ft"),
    ])
    result = main_finetune.main(fargs)
    assert len(result["history"]) == 2
    assert all(np.isfinite(h["loss"]) for h in result["history"])

    # frozen probe: the loaded encoder weights must be the pretrained ones
    # and must not move during the probe
    got = _stem_kernel(result["state"].params)
    np.testing.assert_allclose(got, stem_kernel, rtol=1e-6,
                               err_msg="probe moved or dropped the pretrained encoder")


@pytest.mark.slow
def test_pretrain_then_unet_seg_probe(pretrain_ckpt, tmp_path):
    """Same checkpoint bootstraps the UNet segmentation probe (the trunk
    module names are shared; decoder/upsample/head train, encoder frozen)."""
    import main_finetune
    from mmearth_tpu.checkpoints.load_pretrained import encoder_tree_from_checkpoint

    stem_kernel = _stem_kernel(encoder_tree_from_checkpoint(pretrain_ckpt, depths=(2, 2, 6, 2)))

    generate_synthetic_geobench(tmp_path / "gb", "m-cashew-plant", n_per_split=(16, 8, 8))
    fargs = main_finetune.get_args_parser().parse_args([
        "--data_set", "m-cashew-plant",
        "--processed_dir", str(tmp_path / "gb"),
        "--finetune", str(pretrain_ckpt),
        "--model", "convnextv2_unet_atto",
        "--input_size", "64", "--patch_size", "8",
        "--batch_size", "1", "--epochs", "1",
        "--linear_probe", "True", "--blr", "1e-2",
        "--smoothing", "0",
        "--use_bf16", "False",
        "--output_dir", str(tmp_path / "ft"),
    ])
    result = main_finetune.main(fargs)
    assert all(np.isfinite(h["loss"]) for h in result["history"])
    got = _stem_kernel(result["state"].params)
    np.testing.assert_allclose(got, stem_kernel, rtol=1e-6,
                               err_msg="unet probe moved or dropped the pretrained encoder")
