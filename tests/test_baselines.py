"""Foreign baseline checkpoints (seco/gassl/satlas/imagenet) and the
ResNet-UNet segmentation baseline (reference helpers.py:824-933,
main_finetune.py:480-501)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.checkpoints import foreign as F
from mmearth_tpu.models import resnet as resnet_lib


def _bn_arrays(c):
    return [np.random.rand(c).astype(np.float32), np.zeros(c, np.float32),
            np.zeros(c, np.float32), np.ones(c, np.float32), np.asarray(0, np.int64)]


def fake_torch_resnet_sd(stage_sizes, bottleneck, in_ch=3, num_classes=1000, seed=0):
    """A torchvision-shaped ResNet state dict with the canonical key order."""
    rng = np.random.default_rng(seed)
    sd = {}

    def add_conv(key, cout, cin, k):
        sd[key] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)

    def add_bn(prefix, c):
        for key, arr in zip(F._bn_keys(prefix), _bn_arrays(c)):
            sd[key] = arr

    add_conv("conv1.weight", 64, in_ch, 7)
    add_bn("bn1", 64)
    prev = 64
    for i, n_blocks in enumerate(stage_sizes, start=1):
        f = 64 * 2 ** (i - 1)
        out = f * 4 if bottleneck else f
        for j in range(n_blocks):
            if bottleneck:
                add_conv(f"layer{i}.{j}.conv1.weight", f, prev, 1)
                add_bn(f"layer{i}.{j}.bn1", f)
                add_conv(f"layer{i}.{j}.conv2.weight", f, f, 3)
                add_bn(f"layer{i}.{j}.bn2", f)
                add_conv(f"layer{i}.{j}.conv3.weight", out, f, 1)
                add_bn(f"layer{i}.{j}.bn3", out)
            else:
                add_conv(f"layer{i}.{j}.conv1.weight", f, prev, 3)
                add_bn(f"layer{i}.{j}.bn1", f)
                add_conv(f"layer{i}.{j}.conv2.weight", f, f, 3)
                add_bn(f"layer{i}.{j}.bn2", f)
            if j == 0 and (i > 1 or bottleneck):
                add_conv(f"layer{i}.{j}.downsample.0.weight", out, prev, 1)
                add_bn(f"layer{i}.{j}.downsample.1", out)
            prev = out
    sd["fc.weight"] = rng.normal(size=(num_classes, prev)).astype(np.float32)
    sd["fc.bias"] = np.zeros(num_classes, np.float32)
    return sd


@pytest.mark.parametrize("name,stage_sizes,bottleneck", [
    ("resnet18", (2, 2, 2, 2), False),
    ("resnet50", (3, 4, 6, 3), True),
])
def test_key_order_matches_fabricated_sd(name, stage_sizes, bottleneck):
    sd = fake_torch_resnet_sd(stage_sizes, bottleneck)
    assert list(sd.keys()) == F.torch_resnet_sd_keys(stage_sizes, bottleneck)
    # and against real torchvision when available
    torchvision = pytest.importorskip("torchvision")
    real = torchvision.models.__dict__[name](weights=None)
    assert list(real.state_dict().keys()) == F.torch_resnet_sd_keys(stage_sizes, bottleneck)


@pytest.mark.parametrize("builder,stage_sizes,bottleneck", [
    (resnet_lib.resnet18, (2, 2, 2, 2), False),
    (resnet_lib.resnet50, (3, 4, 6, 3), True),
])
def test_torch_resnet_to_flax_structure(builder, stage_sizes, bottleneck):
    """Converted trees must match our flax ResNet init exactly (structure +
    shapes), so an overlay load is strict."""
    sd = fake_torch_resnet_sd(stage_sizes, bottleneck)
    params, stats = F.torch_resnet_to_flax(sd, stage_sizes, bottleneck)

    model = builder(num_classes=1000, in_chans=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def shapes(tree):
        return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)

    assert shapes(params) == shapes(variables["params"])
    assert shapes(stats) == shapes(variables["batch_stats"])
    # value spot-check incl. layout transform
    np.testing.assert_array_equal(
        params["stem_conv"]["kernel"], np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    )
    np.testing.assert_array_equal(params["fc"]["kernel"], sd["fc.weight"].T)


def test_seco_gassl_satlas_remaps():
    stage_sizes, bottleneck = (2, 2, 2, 2), False
    base = fake_torch_resnet_sd(stage_sizes, bottleneck)
    backbone = {k: v for k, v in base.items() if not k.startswith("fc.")}
    target_keys = F.torch_resnet_sd_keys(stage_sizes, bottleneck, include_fc=False)

    # seco: encoder_q.* keys in backbone order + momentum-encoder junk
    seco = {f"encoder_q.{k}": v for k, v in backbone.items()}
    seco["encoder_k.conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    seco["queue"] = np.zeros((128, 4), np.float32)
    seco["queue_ptr"] = np.asarray(0)
    seco["heads.0.weight"] = np.zeros((4, 4), np.float32)
    out = F.seco_remap(seco, stage_sizes, bottleneck)
    assert list(out.keys()) == target_keys
    for k in target_keys:
        np.testing.assert_array_equal(out[k], backbone[k])

    # gassl: module.-prefixed under a state_dict wrapper
    gassl = {"state_dict": {f"module.backbone.{k}": v for k, v in backbone.items()}}
    gassl["state_dict"]["module.encoder_k.conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    out = F.gassl_remap(gassl, stage_sizes, bottleneck)
    assert list(out.keys()) == target_keys
    for k in target_keys:
        np.testing.assert_array_equal(out[k], backbone[k])

    # satlas: arbitrary foreign names, positional onto the encoder keys
    satlas = {f"backbone.resnet.{i}": v for i, (k, v) in enumerate(backbone.items())}
    out = F.satlas_remap(satlas, stage_sizes, bottleneck)
    assert list(out.keys()) == target_keys

    # dispatch by path substring (helpers.py:824,843,918)
    assert list(F.remap_foreign(seco, "/ckpts/seco_resnet18_1m.pth", stage_sizes, bottleneck)) == target_keys
    assert list(F.remap_foreign(gassl, "/ckpts/gassl_moco.pth", stage_sizes, bottleneck)) == target_keys
    plain = F.remap_foreign(base, "/ckpts/resnet18_imnet.pth", stage_sizes, bottleneck)
    assert "fc.weight" not in plain and "conv1.weight" in plain


def test_load_foreign_resnet_pth_roundtrip(tmp_path):
    """A fabricated seco .pth loads through the real torch.save/load path and
    overlays strictly onto the flax resnet."""
    import torch

    stage_sizes, bottleneck = (2, 2, 2, 2), False
    base = fake_torch_resnet_sd(stage_sizes, bottleneck)
    seco = {f"encoder_q.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in base.items() if not k.startswith("fc.")}
    seco["queue"] = torch.zeros(128, 4)
    path = tmp_path / "seco_resnet18.pth"
    torch.save({"model": seco}, path)

    params, stats = F.load_foreign_resnet(str(path), stage_sizes, bottleneck)
    model = resnet_lib.resnet18(num_classes=10, in_chans=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    from mmearth_tpu.checkpoints import load_pretrained as lp

    merged = lp.load_encoder_into(variables["params"], params)
    np.testing.assert_array_equal(
        merged["stem_conv"]["kernel"], np.transpose(base["conv1.weight"], (2, 3, 1, 0))
    )
    merged_stats = lp.load_encoder_into(variables["batch_stats"], stats)
    assert merged_stats["stage0_0"]["BatchNorm_0"]["var"].shape == (64,)


def test_resnet_unet_shapes():
    model = resnet_lib.resnet18_unet(num_classes=7, in_chans=5)
    x = jnp.zeros((2, 64, 64, 5))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 7)
    # encoder params live under 'encoder' (probe freezing boundary)
    assert "encoder" in variables["params"]
    assert any(k.startswith("decoder") for k in variables["params"])


@pytest.mark.slow
def test_resnet_unet_e2e(tmp_path):
    """smp.Unet-equivalent seg baseline trains end-to-end with the staged
    linear-probe freezing (reference main_finetune.py:487-489 + helpers.py:957-966)."""
    import main_finetune
    from mmearth_tpu.data.geobench import generate_synthetic_geobench

    generate_synthetic_geobench(tmp_path / "proc", "m-cashew-plant", n_per_split=(16, 4, 4))
    args = main_finetune.get_args_parser().parse_args(
        [
            "--data_set", "m-cashew-plant",
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "resnet18_unet",
            "--batch_size", "2", "--epochs", "1",
            "--linear_probe", "True",
            "--use_bf16", "False", "--smoothing", "0.0",
        ]
    )
    result = main_finetune.main(args)
    assert np.isfinite(result["history"][0]["loss"])
    assert result["test_Jaccard"] is not None
