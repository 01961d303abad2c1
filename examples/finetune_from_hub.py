#!/usr/bin/env python
"""Minimal hub-based finetune loop (reference examples/finetune_torchhub.py).

Loads an MP-MAE pretrained backbone through the hub entry point, attaches a
fresh head, and trains a few epochs on a packed GEO-Bench split with a plain
optax loop — the smallest end-to-end consumer of the public API.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hubconf import MPMAE
from mmearth_tpu.data.geobench import NUM_CLASSES, generate_synthetic_geobench
from mmearth_tpu.data.loader import PackedDataset, PackedLoader
from mmearth_tpu.eval.metrics import metric_for
from mmearth_tpu.losses.finetune import smoothed_cross_entropy
from mmearth_tpu.train.optim import zero_grads_mask, mask_updates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="pretrain .pth (synthetic init if omitted)")
    ap.add_argument("--data", default=None, help="packed geobench dir (synthetic if omitted)")
    ap.add_argument("--dataset", default="m-eurosat")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--linear_probe", type=lambda s: s.lower() == "true", default=True)
    args = ap.parse_args()

    ncls = NUM_CLASSES[args.dataset]
    model, params, trainable = MPMAE(
        "convnextv2_atto", pretrained=args.ckpt is not None, ckpt_path=args.ckpt,
        num_classes=ncls, in_chans=12, img_size=56, patch_size=8,
        linear_probe=args.linear_probe,
    )

    if args.data is None:
        paths = generate_synthetic_geobench("/tmp/hub_example", args.dataset, (64, 16, 16))
        train_dir, val_dir = paths["train"], paths["val"]
    else:
        train_dir, val_dir = f"{args.data}/train_{args.dataset}_default", f"{args.data}/val_{args.dataset}_default"

    train = PackedLoader(PackedDataset(train_dir), batch_size=16)
    val = PackedLoader(PackedDataset(val_dir), batch_size=16, shuffle=False, drop_last=False)

    tx = optax.chain(
        mask_updates(zero_grads_mask(params, trainable)),
        optax.adamw(1e-3),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return smoothed_cross_entropy(model.apply({"params": p}, x), y, 0.1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    name, metric = metric_for(args.dataset, ncls)
    for epoch in range(args.epochs):
        train.set_epoch(epoch)
        losses = []
        for batch in train:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(batch["input"]), jnp.asarray(batch["label"])
            )
            losses.append(float(loss))
        metric.reset()
        for batch in val:
            logits = model.apply({"params": params}, jnp.asarray(batch["input"]))
            metric.update(np.asarray(logits), np.asarray(batch["label"]))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}  val {name} {metric.compute():.4f}")


if __name__ == "__main__":
    main()
