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


def main():
    """CLI: visualize reconstructions from a pretrain checkpoint on synthetic
    or real packed data (reference visualize_masking.py __main__)."""
    import argparse

    import jax

    from ..checkpoints import load_pretrained as lp
    from ..configs import modalities as M
    from ..configs.config import model_size

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="pretrain checkpoint (.pth or orbax); random init if omitted")
    ap.add_argument("--model", default="convnextv2_atto")
    ap.add_argument("--input_size", type=int, default=56)
    ap.add_argument("--patch_size", type=int, default=8)
    ap.add_argument("--mask_ratio", type=float, default=0.6)
    ap.add_argument("--out", default="./visualize")
    ap.add_argument("--data_dir", default=None, help="packed mmearth split; synthetic if omitted")
    args = ap.parse_args()

    depths, dims = model_size(args.model)
    model = fcmae_lib.FCMAE(
        img_size=args.input_size, patch_size=args.patch_size, depths=depths, dims=dims,
        sparse=True, loss_aggr="unweighted",
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
    )
    if args.data_dir:
        from ..data.loader import PackedDataset, PackedLoader

        loader = PackedLoader(PackedDataset(args.data_dir), batch_size=4, shuffle=False, drop_last=False)
        batch = {k: jnp.asarray(v[:, : args.input_size, : args.input_size] if v.ndim == 4 else v)
                 for k, v in next(iter(loader)).items()}
    else:
        from ..data.synthetic import generate
        from ..data.mmearth import MMEarthDataset

        root = generate("/tmp/viz_synth", n=8, tile=max(64, args.input_size))
        ds = MMEarthDataset(root, {**M.INP_MODALITIES, **M.OUT_MODALITIES}, split="train")
        items = [ds[i] for i in range(4)]
        batch = {
            k: jnp.asarray(np.stack([it[k] for it in items])[:, : args.input_size, : args.input_size]
                           if items[0][k].ndim == 3 else np.stack([it[k] for it in items]))
            for k in items[0] if k != "id"
        }

    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch
    )["params"]
    if args.ckpt:
        enc = lp.encoder_tree_from_checkpoint(args.ckpt, depths)
        params = jax.tree_util.tree_map(jnp.asarray, lp.load_encoder_into(
            jax.tree_util.tree_map(np.asarray, params), enc))

    maps, mask = run_one_batch(model, {"params": params}["params"], batch, mask_ratio=args.mask_ratio)
    out = render_panels(model, batch, maps, mask, args.out)
    print(f"wrote reconstruction panels to {out}")


if __name__ == "__main__":
    main()
