"""Bootstrap finetune models from pretraining checkpoints.

The reference's ``load_custom_checkpoint`` (helpers.py:799-1002): drop
decoder/mask_token/proj/pred weights, remap sparse->dense kernels, load the
encoder trunk, re-init the head (trunc-normal std 2e-5), and freeze per mode:

  * classifier finetune: everything trainable.
  * classifier linear probe: freeze all, train only the (new) head
    (helpers.py:984-1000).  The final LayerNorm stays at init — pretraining
    has no final norm, and the reference freezes it untrained too.
  * unet probe: freeze the encoder; train upsample layers +
    initial_conv_upsample + head (helpers.py:941-955); the reference then
    unfreezes everything at epoch 50 (main_finetune.py:598-619).

Sources accepted: reference ``.pth`` (raw Minkowski or remapped dense) and our
own Orbax pretrain checkpoints.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from . import torch_convert as tc


def _head_reinit(rng_seed: int, shape) -> np.ndarray:
    # trunc_normal std 2e-5 (helpers.py:866); at this magnitude plain normal
    # is identical in distribution
    rng = np.random.default_rng(rng_seed)
    return (rng.standard_normal(shape) * 2e-5).astype(np.float32)


def encoder_tree_from_checkpoint(path: str | Path, depths, use_orig_stem: bool = False) -> dict:
    """Extract the encoder param tree from a pretrain checkpoint of any
    supported format."""
    path = Path(path)
    if path.suffix == ".pth" or path.suffix == ".pt":
        sd = tc.load_pth(path)
        enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
        if not enc:  # already-stripped dense checkpoint (hub style)
            enc = {k: v for k, v in sd.items()
                   if not any(t in k for t in ("decoder", "mask_token", "proj", "pred", "loss_fn"))}
        if any(k.endswith("kernel") for k in enc):
            enc = tc.remap_minkowski_keys(enc)
        # drop decoder-side keys that may remain + classifier head of foreign ckpts
        enc = {k: v for k, v in enc.items()
               if not any(t in k for t in ("decoder", "mask_token", "proj", "pred", "loss_fn"))}
        return tc.torch_encoder_to_flax(enc, depths, use_orig_stem, include_head=False)
    # our Orbax pretrain checkpoint: {params: {encoder: ...}} or a raw params dir
    from .orbax_io import load_params

    if (path / "default").exists():  # CheckpointManager step dir
        path = path / "default"
    tree = load_params(path)
    if "params" in tree:
        tree = tree["params"]
    if "encoder" in tree:
        tree = tree["encoder"]
    return jax.tree_util.tree_map(np.asarray, tree)


def load_encoder_into(params: dict, encoder_tree: dict, where: str = "") -> dict:
    """Overlay encoder weights onto a freshly-initialized model param tree.
    ``where``: '' to overlay at top level (classifier/unet share the trunk
    module names with the encoder)."""
    params = jax.tree_util.tree_map(np.asarray, params)

    def overlay(dst: dict, src: dict, path=""):
        for k, v in src.items():
            if k not in dst:
                print(f"skipping unexpected checkpoint key {path}/{k}")
                continue
            if isinstance(v, dict):
                overlay(dst[k], v, path + "/" + k)
            else:
                assert dst[k].shape == v.shape, f"{path}/{k}: {dst[k].shape} vs {v.shape}"
                dst[k] = v.astype(dst[k].dtype)

    target = params if not where else params[where]
    overlay(target, encoder_tree)
    return params


def reinit_head(params: dict, seed: int = 0) -> dict:
    """Head re-init for finetune/probe (helpers.py:857-867, 993-1000);
    ``fc`` is the resnet baselines' head name (helpers.py:860-867)."""
    for name in ("head", "fc"):
        if name in params:
            k = params[name]["kernel"]
            params[name]["kernel"] = _head_reinit(seed, k.shape)
            params[name]["bias"] = np.zeros_like(params[name]["bias"])
    return params


# ---------------------------------------------------------------------------
# trainable masks (requires_grad equivalents)
# ---------------------------------------------------------------------------
def classifier_probe_trainable(path: str) -> bool:
    return path.startswith("head")


def unet_probe_trainable(path: str) -> bool:
    return path.startswith(("head", "upsample_layers", "initial_conv_upsample"))


def all_trainable(path: str) -> bool:
    return True
