"""The central user workflow, chained end-to-end: MP-MAE pretrain on
synthetic MMEarth -> Orbax checkpoint -> GEO-Bench linear probe / finetune
bootstrapped from it via ``--finetune`` (reference: main_pretrain.py then
main_finetune.py:503 -> helpers.load_custom_checkpoint)."""
from pathlib import Path

import jax
import numpy as np
import pytest

from mmearth_tpu.data.geobench import generate_synthetic_geobench
from mmearth_tpu.data.synthetic import generate


@pytest.mark.slow
def test_pretrain_then_linear_probe(tmp_path):
    import main_finetune
    import main_pretrain
    from mmearth_tpu.checkpoints.load_pretrained import encoder_tree_from_checkpoint

    mmearth = generate(tmp_path / "mmearth", n=24, tile=64, seed=0)

    # 1 epoch of pretraining (atto 56-8, sparse) -> checkpoint
    pargs = main_pretrain.get_args_parser().parse_args([
        "--data_dir", str(mmearth),
        "--processed_dir", str(tmp_path / "proc"),
        "--output_dir", str(tmp_path / "pt"),
        "--model", "convnextv2_atto",
        "--input_size", "56", "--patch_size", "8",
        "--batch_size", "2", "--epochs", "1", "--warmup_epochs", "1",
        "--use_bf16", "False",
    ])
    main_pretrain.main(pargs)
    ckpt = tmp_path / "pt" / "checkpoints" / "0"
    assert ckpt.exists()

    # the checkpoint's encoder tree is loadable and non-trivial
    enc = encoder_tree_from_checkpoint(ckpt, depths=(2, 2, 6, 2))
    stem_kernel = np.asarray(
        enc["initial_conv"]["kernel"] if "initial_conv" in enc
        else jax.tree_util.tree_leaves(enc)[0])

    # linear probe from that checkpoint on synthetic GEO-Bench
    generate_synthetic_geobench(tmp_path / "gb", "m-eurosat", n_per_split=(32, 8, 8))
    fargs = main_finetune.get_args_parser().parse_args([
        "--data_set", "m-eurosat",
        "--processed_dir", str(tmp_path / "gb"),
        "--finetune", str(ckpt),
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
    final = result["state"].params
    enc_params = final["encoder"] if "encoder" in final else final
    got = np.asarray(
        enc_params["initial_conv"]["kernel"] if "initial_conv" in enc_params
        else jax.tree_util.tree_leaves(enc_params)[0])
    np.testing.assert_allclose(got, stem_kernel, rtol=1e-6,
                               err_msg="probe moved or dropped the pretrained encoder")
