"""Public model-hub entry point (reference hubconf.py:21-93).

``MPMAE(...)`` builds a ConvNeXtV2 classifier from a released MP-MAE
pretraining checkpoint: decoder/mask-token/proj/pred weights are dropped, the
Minkowski kernels are remapped dense, and the head is fresh (finetune init,
trunc-normal std 2e-5) or the model is frozen for linear probing.

Checkpoint names and their download URLs mirror hubconf.py:82-87; pass a local
``.pth`` path via ``ckpt_path`` in offline environments (this container has no
egress).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoints import load_pretrained as lp
from .configs.config import model_size
from .models import convnextv2 as cnx

CKPT_URLS = {
    # released MP-MAE pretraining checkpoints (reference README.md:87-100)
    name: f"https://sid.erda.dk/share_redirect/g23YOnaaTp/pt-{name}.pth"
    for name in (
        "all_mod_atto_1M_64_uncertainty_56-8",
        "all_mod_atto_1M_128_uncertainty_112-16",
        "all_mod_atto_100k_128_uncertainty_112-16",
        "all_mod_tiny_1M_64_uncertainty_56-8",
        "all_mod_tiny_1M_128_uncertainty_112-16",
        "S2_atto_1M_64_uncertainty_56-8",
        "img_mod_atto_1M_64_uncertainty_56-8",
        "pix_mod_atto_1M_64_uncertainty_56-8",
        "rgb_atto_1M_64_uncertainty_56-8",
        "all_mod_atto_1M_64_unweighted_56-8",
    )
}

dependencies = ["jax", "flax"]


def MPMAE(
    model_name: str = "convnextv2_atto",
    ckpt_name: str = "all_mod_atto_1M_64_uncertainty_56-8",
    pretrained: bool = True,
    linear_probe: bool = False,
    ckpt_path: str | Path | None = None,
    num_classes: int = 1000,
    in_chans: int = 12,
    img_size: int = 56,
    patch_size: int = 8,
    seed: int = 0,
    **kwargs,
):
    """Returns (model, params, trainable_fn).

    ``trainable_fn(path) -> bool`` is the requires_grad equivalent: pass it to
    ``mmearth_tpu.train.optim.zero_grads_mask`` to freeze for linear probing.
    """
    depths, dims = model_size(model_name)
    model = cnx.ConvNeXtV2(
        patch_size=patch_size, img_size=img_size, in_chans=in_chans,
        num_classes=num_classes, depths=depths, dims=dims, sparse=False, **kwargs,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, img_size, img_size, in_chans))
    )["params"]

    if pretrained:
        if ckpt_path is None:
            ckpt_path = _download(CKPT_URLS[ckpt_name])
        enc = lp.encoder_tree_from_checkpoint(ckpt_path, depths)
        params = lp.load_encoder_into(params, enc)
        params = lp.reinit_head(params, seed)
        params = jax.tree_util.tree_map(jnp.asarray, params)

    trainable_fn = lp.classifier_probe_trainable if linear_probe else lp.all_trainable
    return model, params, trainable_fn


def _download(url: str) -> Path:
    import urllib.request

    dest = Path.home() / ".cache" / "mmearth_tpu" / Path(url).name
    dest.parent.mkdir(parents=True, exist_ok=True)
    if not dest.exists():
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)
    return dest
