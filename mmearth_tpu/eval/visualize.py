"""Reconstruction visualization (reference visualize_masking.py:58-330).

Runs one batch through a pretrained FCMAE and renders, per pixel modality,
the original / masked / reconstruction / reconstruction-pasted-with-visible
panels, including categorical colormaps for dynamic_world and esa_worldcover.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.multipretext import unpatchify
from ..models import fcmae as fcmae_lib

DW_COLORS = np.array([
    [65, 155, 223], [57, 125, 73], [136, 176, 83], [122, 135, 198],
    [228, 150, 53], [223, 195, 90], [196, 40, 27], [165, 155, 143], [179, 159, 225],
]) / 255.0

ESA_COLORS = np.array([
    [0, 100, 0], [255, 187, 34], [255, 255, 76], [240, 150, 255], [250, 0, 0],
    [180, 180, 180], [240, 240, 240], [0, 100, 200], [0, 150, 160], [0, 207, 117],
    [250, 230, 160],
]) / 255.0


def run_one_batch(model: fcmae_lib.FCMAE, params, batch, rng=None, mask_ratio=0.6):
    """Returns (preds dict of (N,H,W,C) maps, mask (N,L))."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    batch = fcmae_lib.zero_nan_inputs(batch)

    def fwd(mdl, imgs):
        x, mask = mdl.forward_encoder(imgs, mask_ratio)
        return mdl.forward_decoder(x, mask), mask

    preds, mask = model.apply(
        {"params": params}, batch["sentinel2"].astype(model.dtype),
        method=fwd, rngs={"mask": rng},
    )
    maps = {}
    for name, p in preds.items():
        if p.ndim == 3:  # (N, L, p*p*C) pixel modality
            c = model.out_chans[name]
            maps[name] = np.asarray(
                unpatchify(p.astype(jnp.float32), model.patch_size, model.img_size, c)
            )
    return maps, np.asarray(mask)


def render_panels(model, batch, maps, mask, out_dir, sample: int = 0, rgb_bands=(3, 2, 1)):
    """Save original/masked/recon/recon+visible panels per modality."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    g = model.img_size // model.patch_size
    keep_pix = 1.0 - np.repeat(
        np.repeat(mask.reshape(-1, g, g), model.patch_size, 1), model.patch_size, 2
    )[sample][..., None]

    def to_rgb(name, arr):
        if name == "dynamic_world":
            lab = np.clip(np.round(arr[..., 0] if arr.ndim == 3 else arr.argmax(-1)), 0, 8).astype(int)
            return DW_COLORS[lab]
        if name == "esa_worldcover":
            lab = np.clip(np.round(arr[..., 0] if arr.ndim == 3 else arr.argmax(-1)), 0, 10).astype(int)
            return ESA_COLORS[lab]
        if arr.shape[-1] >= 3:
            img = arr[..., list(rgb_bands)]
        else:
            img = np.repeat(arr[..., :1], 3, axis=-1)
        lo, hi = np.nanpercentile(img, 2), np.nanpercentile(img, 98)
        return np.clip((img - lo) / max(hi - lo, 1e-6), 0, 1)

    for name, recon in maps.items():
        if name not in batch:
            continue
        orig = np.asarray(batch[name][sample]).astype(np.float32)
        rec = recon[sample]
        if name in ("dynamic_world", "esa_worldcover"):
            rec_lab = rec.reshape(*rec.shape[:2], -1, model.out_chans[name]).mean(2).argmax(-1)
            rec_img = to_rgb(name, np.eye(model.out_chans[name])[rec_lab])
        else:
            rec_img = to_rgb(name, rec)
        orig_img = to_rgb(name, orig)
        masked_img = orig_img * keep_pix
        paste = rec_img * (1 - keep_pix) + orig_img * keep_pix

        fig, axes = plt.subplots(1, 4, figsize=(12, 3))
        for ax, img, title in zip(axes, [orig_img, masked_img, rec_img, paste],
                                  ["original", "masked", "reconstruction", "recon + visible"]):
            ax.imshow(img)
            ax.set_title(title)
            ax.axis("off")
        fig.suptitle(name)
        fig.savefig(out_dir / f"{name}.png", dpi=100, bbox_inches="tight")
        plt.close(fig)
    return out_dir
