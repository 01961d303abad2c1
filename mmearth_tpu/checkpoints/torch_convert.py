"""Bidirectional torch `.pth` <-> flax params conversion.

Implements the reference's checkpoint surgery exactly:
  * :func:`remap_minkowski_keys` == helpers.remap_checkpoint_keys
    (helpers.py:668-707): strips the ``encoder.`` prefix, converts Minkowski
    ``*.kernel`` tensors — (K^2, in, out) standard conv and (K^2, C) depthwise
    — into torch OIHW via the same permute/reshape/transpose (the final
    ``.transpose(3, 2)`` accounts for Minkowski's x-fastest kernel-offset
    ordering), collapses ``.ln.`` / ``.linear.`` path segments, flattens
    biases and reshapes GRN affines.
  * :func:`torch_encoder_to_flax` / :func:`flax_encoder_to_torch` map the
    remapped torch-dense layout onto our NHWC flax tree (OIHW -> HWIO etc.).
  * :func:`torch_fcmae_to_flax` / :func:`flax_fcmae_to_torch` cover the full
    pretraining checkpoint (proj, mask token, shared decoder, per-modality
    pred heads, uncertainty log-vars).

All functions operate on numpy arrays; ``load_pth`` needs torch only to
deserialize.
"""
from __future__ import annotations

import math
import re
from collections import OrderedDict
from typing import Mapping

import numpy as np


def load_pth(path) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def save_pth(path, sd: Mapping[str, np.ndarray], wrap_model_key: bool = True):
    import torch

    tensors = OrderedDict((k, torch.from_numpy(np.ascontiguousarray(v))) for k, v in sd.items())
    torch.save({"model": tensors} if wrap_model_key else tensors, path)


# ---------------------------------------------------------------------------
# Minkowski -> dense torch layout (helpers.py:668-707)
# ---------------------------------------------------------------------------
def remap_minkowski_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    new = OrderedDict()
    for k, v in sd.items():
        v = np.asarray(v)
        if k.startswith("encoder"):
            k = ".".join(k.split(".")[1:])
        if k.endswith("kernel"):
            base = ".".join(k.split(".")[:-1])
            new_k = base + ".weight"
            if v.ndim == 3:  # standard conv: (K^2, in, out)
                kv, in_dim, out_dim = v.shape
                ks = int(math.sqrt(kv))
                new[new_k] = (
                    v.transpose(2, 1, 0).reshape(out_dim, in_dim, ks, ks).swapaxes(3, 2)
                )
            elif v.ndim == 2:  # depthwise: (K^2, C)
                kv, dim = v.shape
                ks = int(math.sqrt(kv))
                new[new_k] = v.transpose(1, 0).reshape(dim, 1, ks, ks).swapaxes(3, 2)
            else:  # K^2 == 1 kernels can arrive squeezed
                new[new_k] = v
            continue
        elif ".ln." in f".{k}." or ".linear." in f".{k}.":
            parts = k.split(".")
            # remove the 'ln'/'linear' segment (second to last), as the
            # reference does (helpers.py:689-692)
            if parts[-2] in ("ln", "linear"):
                parts.pop(-2)
            new_k = ".".join(parts)
        else:
            new_k = k
        new[new_k] = v

    for k in list(new.keys()):
        v = new[k]
        if k.endswith("bias") and v.ndim != 1:
            new[k] = v.reshape(-1)
        elif "grn" in k:
            new[k] = np.expand_dims(np.expand_dims(v, 0), 1)
    return dict(new)


# ---------------------------------------------------------------------------
# torch dense layout <-> flax NHWC tree
# ---------------------------------------------------------------------------
def _conv_t2f(w):  # OIHW -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv_f2t(w):  # HWIO -> OIHW
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _set(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _block_t2f(sd, prefix, tree, tpath):
    _set(tree, tpath + ("dwconv", "kernel"), _conv_t2f(sd[f"{prefix}.dwconv.weight"]))
    _set(tree, tpath + ("dwconv", "bias"), sd[f"{prefix}.dwconv.bias"])
    _set(tree, tpath + ("norm", "scale"), sd[f"{prefix}.norm.weight"])
    _set(tree, tpath + ("norm", "bias"), sd[f"{prefix}.norm.bias"])
    _set(tree, tpath + ("pwconv1", "kernel"), sd[f"{prefix}.pwconv1.weight"].T)
    _set(tree, tpath + ("pwconv1", "bias"), sd[f"{prefix}.pwconv1.bias"])
    _set(tree, tpath + ("grn", "gamma"), sd[f"{prefix}.grn.gamma"].reshape(-1))
    _set(tree, tpath + ("grn", "beta"), sd[f"{prefix}.grn.beta"].reshape(-1))
    _set(tree, tpath + ("pwconv2", "kernel"), sd[f"{prefix}.pwconv2.weight"].T)
    _set(tree, tpath + ("pwconv2", "bias"), sd[f"{prefix}.pwconv2.bias"])


def _block_f2t(tree, sd, prefix):
    blk = tree
    sd[f"{prefix}.dwconv.weight"] = _conv_f2t(blk["dwconv"]["kernel"])
    sd[f"{prefix}.dwconv.bias"] = blk["dwconv"]["bias"]
    sd[f"{prefix}.norm.weight"] = blk["norm"]["scale"]
    sd[f"{prefix}.norm.bias"] = blk["norm"]["bias"]
    sd[f"{prefix}.pwconv1.weight"] = np.ascontiguousarray(blk["pwconv1"]["kernel"].T)
    sd[f"{prefix}.pwconv1.bias"] = blk["pwconv1"]["bias"]
    sd[f"{prefix}.grn.gamma"] = blk["grn"]["gamma"].reshape(1, 1, 1, -1)
    sd[f"{prefix}.grn.beta"] = blk["grn"]["beta"].reshape(1, 1, 1, -1)
    sd[f"{prefix}.pwconv2.weight"] = np.ascontiguousarray(blk["pwconv2"]["kernel"].T)
    sd[f"{prefix}.pwconv2.bias"] = blk["pwconv2"]["bias"]


def torch_encoder_to_flax(
    sd: Mapping[str, np.ndarray],
    depths,
    use_orig_stem: bool = False,
    include_head: bool = True,
) -> dict:
    """Remapped torch-dense state dict -> flax ConvNeXtV2 param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: dict = {}
    if use_orig_stem:
        _set(tree, ("stem_orig_conv", "kernel"), _conv_t2f(sd["stem_orig.0.weight"]))
        _set(tree, ("stem_orig_conv", "bias"), sd["stem_orig.0.bias"])
        _set(tree, ("stem_orig_norm", "scale"), sd["stem_orig.1.weight"])
        _set(tree, ("stem_orig_norm", "bias"), sd["stem_orig.1.bias"])
    else:
        _set(tree, ("initial_conv_conv", "kernel"), _conv_t2f(sd["initial_conv.0.weight"]))
        _set(tree, ("initial_conv_conv", "bias"), sd["initial_conv.0.bias"])
        _set(tree, ("initial_conv_norm", "scale"), sd["initial_conv.1.weight"])
        _set(tree, ("initial_conv_norm", "bias"), sd["initial_conv.1.bias"])
        stem_w = sd["stem.0.weight"]
        if stem_w.ndim == 2:  # 1x1 depthwise stored squeezed
            stem_w = stem_w.reshape(*stem_w.shape, 1, 1)
        _set(tree, ("stem_conv", "kernel"), _conv_t2f(stem_w))
        _set(tree, ("stem_conv", "bias"), sd["stem.0.bias"])
        _set(tree, ("stem_norm", "scale"), sd["stem.1.weight"])
        _set(tree, ("stem_norm", "bias"), sd["stem.1.bias"])

    for i in range(3):
        _set(tree, (f"downsample_norms_{i}", "scale"), sd[f"downsample_layers.{i}.0.weight"])
        _set(tree, (f"downsample_norms_{i}", "bias"), sd[f"downsample_layers.{i}.0.bias"])
        _set(tree, (f"downsample_convs_{i}", "kernel"), _conv_t2f(sd[f"downsample_layers.{i}.1.weight"]))
        _set(tree, (f"downsample_convs_{i}", "bias"), sd[f"downsample_layers.{i}.1.bias"])

    for i, depth in enumerate(depths):
        for j in range(depth):
            _block_t2f(sd, f"stages.{i}.{j}", tree, (f"stages_{i}_{j}",))

    if include_head and "head.weight" in sd:
        _set(tree, ("norm", "scale"), sd["norm.weight"])
        _set(tree, ("norm", "bias"), sd["norm.bias"])
        _set(tree, ("head", "kernel"), sd["head.weight"].T)
        _set(tree, ("head", "bias"), sd["head.bias"])
    return tree


def flax_encoder_to_torch(tree: Mapping, depths, use_orig_stem: bool = False) -> dict[str, np.ndarray]:
    tree = {k: v for k, v in tree.items()}
    sd: dict[str, np.ndarray] = {}
    np_tree = _to_numpy(tree)
    if use_orig_stem:
        sd["stem_orig.0.weight"] = _conv_f2t(np_tree["stem_orig_conv"]["kernel"])
        sd["stem_orig.0.bias"] = np_tree["stem_orig_conv"]["bias"]
        sd["stem_orig.1.weight"] = np_tree["stem_orig_norm"]["scale"]
        sd["stem_orig.1.bias"] = np_tree["stem_orig_norm"]["bias"]
    else:
        sd["initial_conv.0.weight"] = _conv_f2t(np_tree["initial_conv_conv"]["kernel"])
        sd["initial_conv.0.bias"] = np_tree["initial_conv_conv"]["bias"]
        sd["initial_conv.1.weight"] = np_tree["initial_conv_norm"]["scale"]
        sd["initial_conv.1.bias"] = np_tree["initial_conv_norm"]["bias"]
        sd["stem.0.weight"] = _conv_f2t(np_tree["stem_conv"]["kernel"])
        sd["stem.0.bias"] = np_tree["stem_conv"]["bias"]
        sd["stem.1.weight"] = np_tree["stem_norm"]["scale"]
        sd["stem.1.bias"] = np_tree["stem_norm"]["bias"]
    for i in range(3):
        sd[f"downsample_layers.{i}.0.weight"] = np_tree[f"downsample_norms_{i}"]["scale"]
        sd[f"downsample_layers.{i}.0.bias"] = np_tree[f"downsample_norms_{i}"]["bias"]
        sd[f"downsample_layers.{i}.1.weight"] = _conv_f2t(np_tree[f"downsample_convs_{i}"]["kernel"])
        sd[f"downsample_layers.{i}.1.bias"] = np_tree[f"downsample_convs_{i}"]["bias"]
    for i, depth in enumerate(depths):
        for j in range(depth):
            _block_f2t(np_tree[f"stages_{i}_{j}"], sd, f"stages.{i}.{j}")
    if "head" in np_tree:
        sd["norm.weight"] = np_tree["norm"]["scale"]
        sd["norm.bias"] = np_tree["norm"]["bias"]
        sd["head.weight"] = np.ascontiguousarray(np_tree["head"]["kernel"].T)
        sd["head.bias"] = np_tree["head"]["bias"]
    return sd


def torch_unet_to_flax(
    sd: Mapping[str, np.ndarray], depths, use_orig_stem: bool = False,
) -> dict:
    """Reference ConvNeXtV2_unet state dict -> flax ConvNeXtV2Unet param tree.

    Encoder keys share the classifier layout (initial_conv/stem/
    downsample_layers/stages, reference convnextv2_unet.py:106-156); decoder
    adds upsample_layers.{0-3}.{conv,norm} (UpsampleBlock,
    convnextv2_unet.py:52-66,161-218), initial_conv_upsample.{0,1}
    (:181-212) and a 1x1 Conv2d head (:159).  The reference's registered but
    unused final ``norm`` LayerNorm (:158) has no flax counterpart and is
    dropped.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree = torch_encoder_to_flax(sd, depths, use_orig_stem, include_head=False)
    for i in range(4):
        _set(tree, (f"upsample_layers_{i}", "conv", "kernel"),
             _conv_t2f(sd[f"upsample_layers.{i}.conv.weight"]))
        _set(tree, (f"upsample_layers_{i}", "conv", "bias"),
             sd[f"upsample_layers.{i}.conv.bias"])
        _set(tree, (f"upsample_layers_{i}", "norm", "scale"),
             sd[f"upsample_layers.{i}.norm.weight"])
        _set(tree, (f"upsample_layers_{i}", "norm", "bias"),
             sd[f"upsample_layers.{i}.norm.bias"])
    _set(tree, ("initial_conv_upsample_conv", "kernel"),
         _conv_t2f(sd["initial_conv_upsample.0.weight"]))
    _set(tree, ("initial_conv_upsample_conv", "bias"), sd["initial_conv_upsample.0.bias"])
    _set(tree, ("initial_conv_upsample_norm", "scale"), sd["initial_conv_upsample.1.weight"])
    _set(tree, ("initial_conv_upsample_norm", "bias"), sd["initial_conv_upsample.1.bias"])
    _set(tree, ("head", "kernel"), _conv_t2f(sd["head.weight"]))
    _set(tree, ("head", "bias"), sd["head.bias"])
    return tree


def flax_unet_to_torch(
    tree: Mapping, depths, use_orig_stem: bool = False, dims=None,
) -> dict[str, np.ndarray]:
    """Reverse of :func:`torch_unet_to_flax`.  When ``dims`` is given, emits
    the reference's unused final-norm defaults (LN = 1/0) so the export
    strict-loads into ``ConvNeXtV2_unet``."""
    np_tree = _to_numpy(dict(tree))
    sd = flax_encoder_to_torch(
        {k: v for k, v in np_tree.items()
         if not k.startswith(("upsample_layers_", "initial_conv_upsample_", "head"))},
        depths, use_orig_stem)
    for i in range(4):
        up = np_tree[f"upsample_layers_{i}"]
        sd[f"upsample_layers.{i}.conv.weight"] = _conv_f2t(up["conv"]["kernel"])
        sd[f"upsample_layers.{i}.conv.bias"] = up["conv"]["bias"]
        sd[f"upsample_layers.{i}.norm.weight"] = up["norm"]["scale"]
        sd[f"upsample_layers.{i}.norm.bias"] = up["norm"]["bias"]
    sd["initial_conv_upsample.0.weight"] = _conv_f2t(np_tree["initial_conv_upsample_conv"]["kernel"])
    sd["initial_conv_upsample.0.bias"] = np_tree["initial_conv_upsample_conv"]["bias"]
    sd["initial_conv_upsample.1.weight"] = np_tree["initial_conv_upsample_norm"]["scale"]
    sd["initial_conv_upsample.1.bias"] = np_tree["initial_conv_upsample_norm"]["bias"]
    sd["head.weight"] = _conv_f2t(np_tree["head"]["kernel"])
    sd["head.bias"] = np_tree["head"]["bias"]
    if dims is not None:
        sd["norm.weight"] = np.ones(dims[-1], dtype=np.float32)
        sd["norm.bias"] = np.zeros(dims[-1], dtype=np.float32)
    return sd


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# ---------------------------------------------------------------------------
# full FCMAE checkpoints
# ---------------------------------------------------------------------------
IMAGE_LEVEL = ("biome", "eco_region", "lat", "lon", "month", "era5")


def torch_fcmae_to_flax(
    sd: Mapping[str, np.ndarray], depths, out_modalities, decoder_depth: int = 1,
    use_orig_stem: bool = False,
) -> dict:
    """Full pretrain `.pth` (raw Minkowski or remapped) -> FCMAE param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.endswith("kernel") for k in sd):
        enc_sd = remap_minkowski_keys({k: v for k, v in sd.items() if k.startswith("encoder")})
    else:
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    tree: dict = {"encoder": torch_encoder_to_flax(enc_sd, depths, use_orig_stem, include_head=False)}

    _set(tree, ("proj", "kernel"), _conv_t2f(sd["proj.weight"]))
    _set(tree, ("proj", "bias"), sd["proj.bias"])
    _set(tree, ("mask_token",), sd["mask_token"].reshape(1, 1, 1, -1))

    first_mod = next(iter(out_modalities))
    for d in range(decoder_depth):
        _block_t2f(sd, f"decoder_dict.{first_mod}.{d}", tree, (f"decoder_{d}",))
    if "layer_norm_tmp.weight" in sd:
        _set(tree, ("layer_norm_tmp", "scale"), sd["layer_norm_tmp.weight"])
        _set(tree, ("layer_norm_tmp", "bias"), sd["layer_norm_tmp.bias"])

    for mod in out_modalities:
        w = sd[f"pred_dict.{mod}.weight"]
        b = sd[f"pred_dict.{mod}.bias"]
        if mod in IMAGE_LEVEL:
            _set(tree, (f"pred_{mod}", "kernel"), w.T)
        else:
            _set(tree, (f"pred_{mod}", "kernel"), _conv_t2f(w))
        _set(tree, (f"pred_{mod}", "bias"), b)

    if "loss_fn.log_vars" in sd:
        _set(tree, ("log_vars",), sd["loss_fn.log_vars"])
    return tree


def flax_fcmae_to_torch(tree: Mapping, depths, out_modalities, decoder_depth: int = 1,
                        use_orig_stem: bool = False, dims=None,
                        num_classes: int = 1000,
                        target: str = "finetune") -> dict[str, np.ndarray]:
    """FCMAE params -> reference-compatible `.pth` state dict.  The shared
    decoder stack is written under *every* modality name, exactly as torch's
    state_dict does for the shared Block instances (fcmae.py:119-137).

    ``target`` selects which reference consumer the export matches:

    * ``"finetune"`` (default) — the pretrain-checkpoint interchange format
      main_finetune consumes through ``helpers.remap_checkpoint_keys``
      (helpers.py:668-707).  That remap unconditionally ``unsqueeze(0).
      unsqueeze(1)``-s every ``grn`` parameter (helpers.py:701-707), because
      the reference's sparse pretrain stores MinkowskiGRN affines as
      ``(1, C)`` (sparse_norm_layers.py:20-22); encoder grn is therefore
      emitted ``(1, C)`` here so the remap lands on the dense model's
      ``(1, 1, 1, C)``.  A dense-shaped grn would remap to 6-D and be
      *silently dropped* by the non-strict load — measured as exactly that
      failure in the round-5 seg round-trip smoke before this format
      existed.  No classifier norm/head keys are fabricated (the reference's
      sparse encoder registers none, convnextv2_sparse.py:71-).  Decoder
      grn stays dense ``(1, 1, 1, C)``: the reference decoder is built from
      *dense* Blocks (fcmae.py:119-137), and finetune deletes decoder keys
      before the remap (helpers.py:886-890).
    * ``"fcmae"`` — strict-loads into the reference's *dense* FCMAE (its
      encoder registers an unused classifier norm/head,
      convnextv2.py:148-153): dense grn shapes everywhere, plus fresh
      norm/head defaults (LN = 1/0, head = 0) when ``dims`` is given.
    """
    if target not in ("finetune", "fcmae"):
        raise ValueError(f"target must be 'finetune' or 'fcmae', got {target!r}")
    np_tree = _to_numpy(dict(tree))
    sd: dict[str, np.ndarray] = {}
    for k, v in flax_encoder_to_torch(np_tree["encoder"], depths, use_orig_stem).items():
        sd[f"encoder.{k}"] = v
    if target == "finetune":
        for k in list(sd):
            if ".grn." in k:
                sd[k] = sd[k].reshape(1, -1)
    if target == "fcmae" and dims is not None and "encoder.norm.weight" not in sd:
        sd["encoder.norm.weight"] = np.ones(dims[-1], dtype=np.float32)
        sd["encoder.norm.bias"] = np.zeros(dims[-1], dtype=np.float32)
        sd["encoder.head.weight"] = np.zeros((num_classes, dims[-1]), dtype=np.float32)
        sd["encoder.head.bias"] = np.zeros(num_classes, dtype=np.float32)
    sd["proj.weight"] = _conv_f2t(np_tree["proj"]["kernel"])
    sd["proj.bias"] = np_tree["proj"]["bias"]
    sd["mask_token"] = np_tree["mask_token"].reshape(1, -1, 1, 1)
    for mod in out_modalities:
        for d in range(decoder_depth):
            _block_f2t(np_tree[f"decoder_{d}"], sd, f"decoder_dict.{mod}.{d}")
        w = np_tree[f"pred_{mod}"]["kernel"]
        if mod in IMAGE_LEVEL:
            sd[f"pred_dict.{mod}.weight"] = np.ascontiguousarray(w.T)
        else:
            sd[f"pred_dict.{mod}.weight"] = _conv_f2t(w)
        sd[f"pred_dict.{mod}.bias"] = np_tree[f"pred_{mod}"]["bias"]
    if "layer_norm_tmp" in np_tree:
        sd["layer_norm_tmp.weight"] = np_tree["layer_norm_tmp"]["scale"]
        sd["layer_norm_tmp.bias"] = np_tree["layer_norm_tmp"]["bias"]
    if "log_vars" in np_tree:
        sd["loss_fn.log_vars"] = np_tree["log_vars"]
    return sd
