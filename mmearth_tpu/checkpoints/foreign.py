"""Foreign baseline checkpoints: seco / gassl / satlas / imagenet ResNets.

The reference compares MP-MAE against ResNet baselines pretrained elsewhere
and bootstraps them with key surgery in ``load_custom_checkpoint``
(helpers.py:824-850 finetune branch, :892-933 linear-probe branch):

  * **seco** (SeasonalContrast, MoCo-style): drop ``encoder_k``/``queue``/
    ``heads`` keys, then positionally rename the remaining keys onto the
    target ResNet's ``state_dict()`` order (minus the 2 fc keys).
  * **gassl** (Geography-Aware SSL): unwrap ``state_dict``, strip the
    ``module.`` DDP prefix, then the same drop + positional rename.
  * **satlas** (unet only): positional rename onto the unet encoder keys
    (helpers.py:924-928).
  * anything else goes through ``remap_checkpoint_keys`` (a no-op for plain
    torchvision/imagenet ResNet state dicts).

Positional renaming works because all of these checkpoints register the
ResNet backbone modules in torchvision order; we reproduce that order with
:func:`torch_resnet_sd_keys` instead of instantiating torchvision, and then
convert the torch-keyed dict into our flax ResNet tree (params +
batch_stats) with :func:`torch_resnet_to_flax`.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np


def _bn_keys(prefix: str) -> list[str]:
    # torch state_dict order: params (weight, bias) then buffers
    return [f"{prefix}.weight", f"{prefix}.bias", f"{prefix}.running_mean",
            f"{prefix}.running_var", f"{prefix}.num_batches_tracked"]


def torch_resnet_sd_keys(stage_sizes: Sequence[int], bottleneck: bool,
                         include_fc: bool = True) -> list[str]:
    """The exact ``state_dict()`` key order of a torchvision ResNet
    (registration order; parameters before buffers within each module)."""
    keys = ["conv1.weight"] + _bn_keys("bn1")
    for i, n_blocks in enumerate(stage_sizes, start=1):
        for j in range(n_blocks):
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                keys += [f"layer{i}.{j}.conv{c}.weight"] + _bn_keys(f"layer{i}.{j}.bn{c}")
            # downsample: first block of layers 2-4; also layer1.0 for
            # bottleneck (64 -> 256 channel expansion)
            if j == 0 and (i > 1 or bottleneck):
                keys += [f"layer{i}.{j}.downsample.0.weight"]
                keys += _bn_keys(f"layer{i}.{j}.downsample.1")
    if include_fc:
        keys += ["fc.weight", "fc.bias"]
    return keys


def _drop_moco_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop momentum-encoder / queue / head keys (helpers.py:828-833)."""
    return {k: v for k, v in sd.items()
            if not any(t in k for t in ("encoder_k", "queue", "heads"))}


def positional_rename(sd: Mapping[str, np.ndarray], target_keys: Sequence[str]) -> dict:
    """Rename the checkpoint's keys onto ``target_keys`` by position — the
    reference's ``zip(model.state_dict().keys()[:-2], checkpoint.keys())``
    trick (helpers.py:839-841).  Extra checkpoint keys beyond the target list
    are dropped (torch's non-strict load ignores them anyway)."""
    src_keys = list(sd.keys())
    return {tk: np.asarray(sd[sk]) for tk, sk in zip(target_keys, src_keys)}


def seco_remap(sd: Mapping[str, np.ndarray], stage_sizes: Sequence[int],
               bottleneck: bool) -> dict[str, np.ndarray]:
    """SeCo MoCo checkpoint -> torchvision-keyed ResNet backbone
    (helpers.py:824-841; fc excluded, reference re-inits it)."""
    sd = _drop_moco_keys(sd)
    return positional_rename(sd, torch_resnet_sd_keys(stage_sizes, bottleneck, include_fc=False))


def gassl_remap(sd: Mapping[str, np.ndarray], stage_sizes: Sequence[int],
                bottleneck: bool) -> dict[str, np.ndarray]:
    """GASSL checkpoint -> torchvision-keyed ResNet backbone
    (helpers.py:843-855: unwrap state_dict, strip ``module.``, drop, zip)."""
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    sd = _drop_moco_keys(sd)
    return positional_rename(sd, torch_resnet_sd_keys(stage_sizes, bottleneck, include_fc=False))


def satlas_remap(sd: Mapping[str, np.ndarray], stage_sizes: Sequence[int],
                 bottleneck: bool) -> dict[str, np.ndarray]:
    """Satlas checkpoint -> ResNet encoder keys for the unet baseline
    (helpers.py:924-928: positional zip onto the model's encoder keys)."""
    return positional_rename(sd, torch_resnet_sd_keys(stage_sizes, bottleneck, include_fc=False))


def remap_foreign(sd: Mapping[str, np.ndarray], finetune_path: str,
                  stage_sizes: Sequence[int], bottleneck: bool) -> dict[str, np.ndarray]:
    """Dispatch on the checkpoint path substring, as the reference does
    (helpers.py:824, 843, 892, 918)."""
    if "seco" in finetune_path:
        return seco_remap(sd, stage_sizes, bottleneck)
    if "gassl" in finetune_path:
        return gassl_remap(sd, stage_sizes, bottleneck)
    if "satlas" in finetune_path:
        return satlas_remap(sd, stage_sizes, bottleneck)
    # plain torchvision / imagenet ResNet: keys already canonical
    return {k: np.asarray(v) for k, v in sd.items() if not k.startswith("fc.")}


# ---------------------------------------------------------------------------
# torch ResNet state dict -> flax ResNet tree
# ---------------------------------------------------------------------------
def _conv_t2f(w: np.ndarray) -> np.ndarray:  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def torch_resnet_to_flax(sd: Mapping[str, np.ndarray], stage_sizes: Sequence[int],
                         bottleneck: bool) -> tuple[dict, dict]:
    """Torchvision-keyed ResNet state dict -> (params, batch_stats) trees for
    :class:`mmearth_tpu.models.resnet.ResNet`.  ``fc`` is copied when present
    and shape-compatible consumers exist; callers typically re-init it."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(tprefix: str, fname: str, scope_p: dict, scope_s: dict):
        scope_p[fname] = {"scale": sd[f"{tprefix}.weight"], "bias": sd[f"{tprefix}.bias"]}
        scope_s[fname] = {"mean": sd[f"{tprefix}.running_mean"], "var": sd[f"{tprefix}.running_var"]}

    params["stem_conv"] = {"kernel": _conv_t2f(sd["conv1.weight"])}
    put_bn("bn1", "stem_norm", params, stats)

    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes, start=1):
        for j in range(n_blocks):
            name = f"stage{i - 1}_{j}"
            bp: dict = {}
            bs: dict = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {"kernel": _conv_t2f(sd[f"layer{i}.{j}.conv{c + 1}.weight"])}
                put_bn(f"layer{i}.{j}.bn{c + 1}", f"BatchNorm_{c}", bp, bs)
            if f"layer{i}.{j}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv_t2f(sd[f"layer{i}.{j}.downsample.0.weight"])}
                put_bn(f"layer{i}.{j}.downsample.1", "downsample_norm", bp, bs)
            params[name] = bp
            stats[name] = bs

    if "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T, "bias": np.asarray(sd["fc.bias"])}
    return params, stats


def load_foreign_resnet(path: str, stage_sizes: Sequence[int], bottleneck: bool):
    """Load a foreign ResNet ``.pth`` (seco/gassl/satlas/imagenet), returning
    (params, batch_stats) trees without the fc head."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:  # gassl wrapping
        ckpt = ckpt["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}
    sd = remap_foreign(sd, str(path), stage_sizes, bottleneck)
    return torch_resnet_to_flax(sd, stage_sizes, bottleneck)
