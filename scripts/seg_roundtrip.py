#!/usr/bin/env python
"""Segmentation round-trip (VERDICT r4 item 7): the seg mirror of
scripts/e2e_accuracy_roundtrip.py.

The reference's second headline result is GEO-Bench segmentation through
ConvNeXtV2-UNet decoder probing (slurm_scripts/slurm_fine_tune_seg.sh:21-48;
main_finetune.py:598-619 runs 50 epochs of decoder-only probing before
unfreezing).  This script round-trips that path end-to-end:

  A. reuse (or produce) the FCMAE pretrain export from the classification
     round-trip (/tmp/e2e_roundtrip.pth + sidecar).
  B. REFERENCE side: the reference's OWN loader branch for unet linear
     probing — `helpers.load_custom_checkpoint` with model
     convnextv2_unet_atto (remap_checkpoint_keys, non-strict encoder load,
     freeze-all, unfreeze head + upsample_layers + initial_conv_upsample;
     /root/reference/helpers.py:870-957) — into the reference's
     ConvNeXtV2_unet.
  C. OUR side: the post-load full state dict through
     checkpoints/torch_convert.torch_unet_to_flax so BOTH frameworks start
     from bit-identical params (pretrained encoder + the torch fresh-init
     decoder).
  D. train the decoder in both frameworks on the same synthetic seg split
     with the reference's distilled recipe: AdamW lr = blr 1e-2 * batch/256
     (slurm_fine_tune_seg.sh:25), weight_decay 0.3, smoothing 0 (the seg
     scripts pin --smoothing 0.), cosine decay, 50 epochs (the reference's
     decoder-probe phase length, main_finetune.py:600-603), identical batch
     order.  The encoder is frozen in both, so encoder feature pyramids are
     precomputed once per framework (exactly equivalent, ~100x faster).
     Distillation deltas (applied identically to both sides): no
     layer_decay (decoder params are one depth group under 'single' decay
     anyway), no EMA/mixup/reprob (the seg script disables mixup/cutmix).
  E. compare macro-Jaccard (the reference's seg metric,
     engine_finetune.py:46-47 torchmetrics JaccardIndex average='macro')
     per seed; report the |delta| distribution.

Synthetic seg task: per-pixel class labels from an argmax over low-frequency
class fields (contiguous regions), x = signal * center[y[px]] + noise —
pixel-classifiable from channel signatures, denoisable by local aggregation,
difficulty tuned by --signal so the Jaccards land mid-band (unsaturated, the
r4 lesson from the classification round-trip).

Run (TPU or CPU for stage A; CPU for the probes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/seg_roundtrip.py
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from argparse import Namespace
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts"))

DEPTHS, DIMS = (2, 2, 6, 2), (40, 80, 160, 320)
SEG_CLASSES, IMG, IN_CH, PATCH = 6, 32, 12, 8
N_TRAIN, N_TEST, BATCH = 128, 256, 16
EPOCHS, BLR, WD = 50, 1e-2, 0.3
LR = BLR * BATCH / 256  # the reference's blr rule (main_finetune.py:521)

DEC_KEYS = ("upsample_layers_0", "upsample_layers_1", "upsample_layers_2",
            "upsample_layers_3", "initial_conv_upsample_conv",
            "initial_conv_upsample_norm", "head")


def make_seg_split(seed: int, signal: float):
    """Synthetic seg split: label maps are argmaxes of low-frequency class
    fields (8x8 noise nearest-upsampled to IMG), giving contiguous regions;
    x carries a per-class channel signature at each pixel plus unit noise."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(SEG_CLASSES, IN_CH)).astype(np.float32)

    def split(n, s):
        r = np.random.default_rng(s)
        field = r.normal(size=(n, SEG_CLASSES, IMG // 8, IMG // 8))
        field = field.repeat(8, axis=2).repeat(8, axis=3)
        y = field.argmax(1).astype(np.int64)  # (n, IMG, IMG)
        x = signal * centers[y] + r.normal(
            size=(n, IMG, IMG, IN_CH)).astype(np.float32)
        return x.astype(np.float32), y

    return split(N_TRAIN, seed + 1), split(N_TEST, seed + 2)


def macro_jaccard(preds: np.ndarray, labels: np.ndarray) -> float:
    """Macro-averaged multiclass IoU, matching torchmetrics JaccardIndex
    (task='multiclass', average='macro'): classes absent from both pred and
    target contribute 0 to the sum but ARE counted in the mean's denominator
    only when present in target or pred (torchmetrics 1.x semantics:
    NaN-free via score=0 for empty classes, mean over classes present)."""
    ious, present = [], []
    for c in range(SEG_CLASSES):
        p, t = preds == c, labels == c
        inter, union = (p & t).sum(), (p | t).sum()
        ious.append(inter / union if union else 0.0)
        present.append(union > 0)
    ious = np.asarray(ious, np.float64)
    present = np.asarray(present)
    return float(ious[present].mean()) if present.any() else 0.0


# ---------------------------------------------------------------------------
# stage B/C: load + param alignment
# ---------------------------------------------------------------------------
def load_torch_unet(pth_path: Path, seed=13):
    import torch

    from _reference_oracle import load_reference, load_reference_helpers

    ref = load_reference()
    helpers = load_reference_helpers()

    torch.manual_seed(seed)  # deterministic fresh decoder init
    tmodel = ref.convnextv2_unet.ConvNeXtV2_unet(
        patch_size=PATCH, img_size=IMG, in_chans=IN_CH,
        num_classes=SEG_CLASSES, depths=list(DEPTHS), dims=list(DIMS),
        drop_path_rate=0.0)
    args = Namespace(linear_probe=True, finetune=str(pth_path),
                     model="convnextv2_unet_atto", model_prefix="",
                     nb_classes=SEG_CLASSES)
    tmodel, _ = helpers.load_custom_checkpoint(tmodel, args)

    trainable = {n for n, p in tmodel.named_parameters() if p.requires_grad}
    expect = {n for n, _ in tmodel.named_parameters()
              if n.startswith(("upsample_layers.", "initial_conv_upsample.",
                               "head."))}
    assert trainable == expect, (trainable ^ expect)
    tmodel.eval()
    return tmodel


def to_flax_params(tmodel):
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from mmearth_tpu.checkpoints import torch_convert as tc

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return jtu.tree_map(jnp.asarray, tc.torch_unet_to_flax(sd, DEPTHS))


# ---------------------------------------------------------------------------
# frozen-encoder feature pyramids (computed once per framework per seed)
# ---------------------------------------------------------------------------
def torch_pyramids(tmodel, x_np):
    import torch

    outs, feats = [], None
    with torch.no_grad():
        for b in range(0, len(x_np), BATCH):
            x = torch.from_numpy(x_np[b:b + BATCH].transpose(0, 3, 1, 2))
            xb, fb = tmodel.encoder(x)
            outs.append(xb.numpy())
            if feats is None:
                feats = [[f.numpy()] for f in fb]
            else:
                for lst, f in zip(feats, fb):
                    lst.append(f.numpy())
    return (np.concatenate(outs),
            [np.concatenate(lst) for lst in feats])  # NCHW


def jax_pyramids(jmodel, params, x_np):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def enc(x):
        return jmodel.apply({"params": params}, x, method="encoder")

    outs, feats = [], None
    for b in range(0, len(x_np), BATCH):
        xb, fb = enc(jnp.asarray(x_np[b:b + BATCH]))
        outs.append(np.asarray(xb))
        if feats is None:
            feats = [[np.asarray(f)] for f in fb]
        else:
            for lst, f in zip(feats, fb):
                lst.append(np.asarray(f))
    return (np.concatenate(outs),
            [np.concatenate(lst) for lst in feats])  # NHWC


# ---------------------------------------------------------------------------
# decoder probes
# ---------------------------------------------------------------------------
def epoch_order(n, epochs, seed):
    r = np.random.default_rng(seed)
    return [r.permutation(n) for _ in range(epochs)]


def train_decoder_torch(tmodel, xf, feats, ytr, xf_te, feats_te, yte, orders):
    import torch
    import torch.nn.functional as F

    params = [p for p in tmodel.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(params, lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=EPOCHS * (N_TRAIN // BATCH))

    def fwd(xb, fb):
        return tmodel.head(tmodel.decoder(xb, list(fb)))

    losses = []
    for order in orders:
        ep_loss = 0.0
        for b in range(0, N_TRAIN, BATCH):
            idx = order[b:b + BATCH]
            xb = torch.from_numpy(xf[idx])
            fb = [torch.from_numpy(f[idx]) for f in feats]
            y = torch.from_numpy(ytr[idx])
            logits = fwd(xb, fb)  # (B, C, H, W)
            loss = F.cross_entropy(logits, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
            ep_loss += float(loss.detach()) * len(idx)
        losses.append(ep_loss / N_TRAIN)

    preds = []
    with torch.no_grad():
        for b in range(0, len(yte), BATCH):
            xb = torch.from_numpy(xf_te[b:b + BATCH])
            fb = [torch.from_numpy(f[b:b + BATCH]) for f in feats_te]
            preds.append(fwd(xb, fb).argmax(1).numpy())
    preds = np.concatenate(preds)
    return losses, macro_jaccard(preds, yte), preds


def train_decoder_jax(jmodel, params, xf, feats, ytr, xf_te, feats_te, yte,
                      orders):
    import jax
    import jax.numpy as jnp
    import optax

    frozen = {k: v for k, v in params.items() if k not in DEC_KEYS}
    train = {k: params[k] for k in DEC_KEYS}
    tx = optax.adamw(
        optax.cosine_decay_schedule(LR, EPOCHS * (N_TRAIN // BATCH)),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD)
    opt_state = tx.init(train)

    def dec_head(m, x, fb):
        return m.head(m.decoder(x, list(fb)))

    @jax.jit
    def step(train, opt_state, xb, fb, y):
        def lf(tp):
            logits = jmodel.apply({"params": {**frozen, **tp}}, xb, fb,
                                  method=dec_head)
            logp = jax.nn.log_softmax(logits)  # (B, H, W, C)
            return -jnp.take_along_axis(logp, y[..., None], -1).mean()

        loss, grads = jax.value_and_grad(lf)(train)
        updates, opt_state = tx.update(grads, opt_state, train)
        return optax.apply_updates(train, updates), opt_state, loss

    @jax.jit
    def infer(train, xb, fb):
        logits = jmodel.apply({"params": {**frozen, **train}}, xb, fb,
                              method=dec_head)
        return jnp.argmax(logits, -1)

    xf_j = jnp.asarray(xf)
    feats_j = [jnp.asarray(f) for f in feats]
    ytr_j = jnp.asarray(ytr)
    losses = []
    for order in orders:
        ep_loss = 0.0
        for b in range(0, N_TRAIN, BATCH):
            idx = order[b:b + BATCH]
            train, opt_state, loss = step(
                train, opt_state, xf_j[idx],
                [f[idx] for f in feats_j], ytr_j[idx])
            ep_loss += float(loss) * len(idx)
        losses.append(ep_loss / N_TRAIN)

    preds = np.concatenate([
        np.asarray(infer(train, jnp.asarray(xf_te[b:b + BATCH]),
                         [jnp.asarray(f[b:b + BATCH]) for f in feats_te]))
        for b in range(0, len(yte), BATCH)])
    return losses, macro_jaccard(preds, yte), preds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300,
                    help="pretrain steps if the shared .pth must be produced")
    ap.add_argument("--signal", type=float, default=0.35)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    pth_path = Path("/tmp/e2e_roundtrip.pth")
    if not (pth_path.exists() and pth_path.with_suffix(".json").exists()):
        from e2e_accuracy_roundtrip import pretrain_and_export

        pretrain_and_export(args.steps, pth_path)
    sidecar = json.loads(pth_path.with_suffix(".json").read_text())
    print(f"[pretrain] using {pth_path} (sidecar: {sidecar})")

    import jax.numpy as jnp

    from mmearth_tpu.models import unet as unet_lib

    jmodel = unet_lib.convnextv2_unet_atto(
        patch_size=PATCH, img_size=IMG, in_chans=IN_CH,
        num_classes=SEG_CLASSES, dtype=jnp.float32)

    per_seed = []
    first_losses = None
    for si in range(args.seeds):
        seed = 7 + 16 * si
        (xtr, ytr), (xte, yte) = make_seg_split(seed, args.signal)
        tmodel = load_torch_unet(pth_path, seed=13 + si)
        params = to_flax_params(tmodel)

        t0 = time.perf_counter()
        txf, tfeats = torch_pyramids(tmodel, xtr)
        txf_te, tfeats_te = torch_pyramids(tmodel, xte)
        jxf, jfeats = jax_pyramids(jmodel, params, xtr)
        jxf_te, jfeats_te = jax_pyramids(jmodel, params, xte)
        # encoder agreement on the frozen trunk (bottleneck feature)
        enc_rel = float(np.abs(txf.transpose(0, 2, 3, 1) - jxf).max() /
                        (np.abs(txf).max() + 1e-12))
        print(f"[seed {seed}] pyramids in {time.perf_counter() - t0:.0f}s, "
              f"encoder max rel diff {enc_rel:.2e}")

        orders = epoch_order(N_TRAIN, EPOCHS, seed + 3)
        t_losses, t_jac, t_preds = train_decoder_torch(
            tmodel, txf, tfeats, ytr, txf_te, tfeats_te, yte, orders)
        j_losses, j_jac, j_preds = train_decoder_jax(
            jmodel, params, jxf, jfeats, ytr, jxf_te, jfeats_te, yte, orders)
        rec = {
            "seed": seed,
            "torch_jaccard": round(t_jac, 4), "jax_jaccard": round(j_jac, 4),
            "delta_pts": round(abs(t_jac - j_jac) * 100, 2),
            "pixel_agreement": round(float((t_preds == j_preds).mean()), 4),
            "encoder_max_rel_diff": round(enc_rel, 8),
        }
        print(f"[seed {seed}] jaccard torch {t_jac:.4f} vs jax {j_jac:.4f} "
              f"(delta {rec['delta_pts']:.2f} pts, pixel agree "
              f"{rec['pixel_agreement']:.4f})")
        if si == 0:
            first_losses = {"torch": [round(x, 4) for x in t_losses[::5]],
                            "jax": [round(x, 4) for x in j_losses[::5]]}
        per_seed.append(rec)

    deltas = [r["delta_pts"] for r in per_seed]
    report = {
        "task": f"synthetic seg {SEG_CLASSES} classes, {IMG}x{IMG}, signal "
                f"{args.signal}; {N_TRAIN} train / {N_TEST} test, batch {BATCH}",
        "recipe": f"decoder probe (reference seg lp phase): {EPOCHS}ep AdamW "
                  f"lr {LR:.2e} wd {WD} smooth 0 cosine",
        "pretrain_sidecar": sidecar,
        "per_seed": per_seed,
        "jaccard_delta_pts": {"max": max(deltas),
                              "mean": round(float(np.mean(deltas)), 3)},
        "train_losses_first_seed_every5": first_losses,
        "ts": time.time(),
    }
    print(json.dumps({k: v for k, v in report.items()
                      if k != "train_losses_first_seed_every5"}, indent=1))

    out = {}
    acc_path = REPO / "E2E_ACCURACY.json"
    if acc_path.exists():
        out = json.loads(acc_path.read_text())
    out["segmentation"] = report
    acc_path.write_text(json.dumps(out, indent=1))

    ok = True
    jacs = [r[k] for r in per_seed for k in ("torch_jaccard", "jax_jaccard")]
    if not all(0.3 <= j <= 0.97 for j in jacs):
        print(f"WARN: jaccards {jacs} not all mid-band — adjust --signal")
    if max(deltas) > 1.0:
        print(f"FAIL: per-seed jaccard delta max {max(deltas)} pts > 1.0")
        ok = False
    print("seg round-trip " + ("PASSED" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
