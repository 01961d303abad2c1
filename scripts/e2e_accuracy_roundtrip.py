#!/usr/bin/env python
"""Synthetic end-to-end accuracy round-trip (VERDICT r3 item 5).

The closest this environment can get to the north-star "GEO-Bench linear
probe within 0.3 pts" (BASELINE.json; no GEO-Bench download, no reference
GPU): pretrain in OUR framework, export through the `.pth` interface the
reference's users rely on, then linear-probe the exported encoder in BOTH
frameworks on the same synthetic classification split and compare the final
test accuracies.

  A. mini-pretrain the flagship FCMAE (atto 56-8, sparse gathered encoder,
     f32) for --steps steps on synthetic MMEarth batches (runs on the
     attached accelerator; seconds on the TPU).
  B. export the trained params to a reference-compatible `.pth`
     (checkpoints/torch_convert.flax_fcmae_to_torch).
  C. REFERENCE side: `helpers.load_custom_checkpoint` (the reference's own
     loader, /root/reference/helpers.py:869-982 linear-probe branch: remap,
     strict-load, freeze, fresh trunc-normal-2e-5 head) into the reference's
     own ConvNeXtV2 classifier, then train the head with torch AdamW —
     the reference torch loop distilled (engine_finetune.py:56-153 without
     AMP/dist), on CPU.
  D. OUR side: the same `.pth` through torch_encoder_to_flax into our
     classifier (padding_mode="reference" so conv padding matches torch),
     identical head init (copied), identical batch order / LR / AdamW.
  E. assert per-epoch train losses track and final test accuracies agree.

The synthetic split is classifiable by construction (class-dependent means);
both heads train on per-dim-standardized frozen-trunk features with a
cosine-decayed AdamW so they reach full convergence (see make_probe_split's
docstring for the two probe designs that failed first).  Result on record
(E2E_ACCURACY.json): test accuracy 1.000 in BOTH frameworks, prediction
agreement 1.000.

Run (TPU for stage A, CPU for C/D):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/e2e_accuracy_roundtrip.py
"""
from __future__ import annotations

import functools
import json
import sys
import time
from argparse import Namespace
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

DEPTHS, DIMS = (2, 2, 6, 2), (40, 80, 160, 320)
NUM_CLASSES, IMG, IN_CH = 10, 64, 12
N_TRAIN, N_TEST, EPOCHS, BATCH = 256, 128, 150, 32
LR = 3e-3


def make_probe_split(seed=5):
    """Class-separable synthetic split: x = 0.8 * center[y] + noise.

    The first run of this script (0.35 signal, 6 epochs, lr 1e-3 = 48
    head-only steps) left BOTH probes at chance (12.5%) — under-trained, not
    divergent (prediction agreement was still 1.0).  The probe now
    precomputes the frozen trunk's pooled+LN features once per framework
    (mathematically identical for a frozen deterministic trunk — the
    reference's linear-probe freezes everything but the head,
    helpers.py:869-982) so the head can actually be trained to convergence
    (150 epochs x 8 steps) in seconds."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(NUM_CLASSES, IMG, IMG, IN_CH)).astype(np.float32)

    def split(n, s):
        r = np.random.default_rng(s)
        y = r.integers(0, NUM_CLASSES, size=(n,))
        x = 0.8 * centers[y] + r.normal(size=(n, IMG, IMG, IN_CH)).astype(np.float32)
        return x.astype(np.float32), y.astype(np.int64)

    return split(N_TRAIN, seed + 1), split(N_TEST, seed + 2)


def pretrain_and_export(steps: int, pth_path: Path):
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.checkpoints import torch_convert as tc
    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.schedule import warmup_cosine
    from mmearth_tpu.train.step import TrainState
    from mmearth_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", 256 if jax.default_backend() != "cpu" else 8,
        dtype=jnp.float32)
    sched = warmup_cosine(1.5e-4 * batch / 256, 0.0, steps, 0.1 * steps, 1)
    tx = optim_lib.make_pretrain_optimizer(state.params, sched)
    state = TrainState.create(state.params, tx)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)

    chunk = min(50, steps)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def run_chunk(state, data, rng, k):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, data, jax.random.fold_in(rng, i))
            return (st, metrics["loss"]), None

        (state, last), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(k))
        return state, last

    t0 = time.perf_counter()
    done = 0
    while done < steps:
        state, last = run_chunk(state, data, jax.random.fold_in(rng, done), chunk)
        done += chunk
    final_loss = float(last)
    print(f"[pretrain] {done} steps on {jax.default_backend()} in "
          f"{time.perf_counter() - t0:.0f}s, final loss {final_loss:.4f}")

    params = jax.tree_util.tree_map(np.asarray, state.params)
    sd = tc.flax_fcmae_to_torch(params, DEPTHS, M.OUT_MODALITIES, dims=DIMS)
    tc.save_pth(pth_path, sd)
    print(f"[export] wrote {pth_path} ({len(sd)} tensors)")
    return final_loss


def probe_torch(pth_path: Path, train, test, seed=13):
    import torch
    import torch.nn.functional as F

    from _reference_oracle import load_reference, load_reference_helpers

    ref = load_reference()
    helpers = load_reference_helpers()

    torch.manual_seed(seed)
    tmodel = ref.convnextv2.ConvNeXtV2(
        patch_size=8, img_size=IMG, in_chans=IN_CH, num_classes=NUM_CLASSES,
        depths=list(DEPTHS), dims=list(DIMS), drop_path_rate=0.0)
    args = Namespace(linear_probe=True, finetune=str(pth_path),
                     model="convnextv2_atto", model_prefix="", nb_classes=NUM_CLASSES)
    torch.manual_seed(seed + 1)  # deterministic fresh-head init
    tmodel, _ = helpers.load_custom_checkpoint(tmodel, args)
    tmodel.train()

    head_init = {
        "weight": tmodel.head.weight.detach().numpy().copy(),
        "bias": tmodel.head.bias.detach().numpy().copy(),
    }

    # frozen deterministic trunk: precompute pooled+LN features once
    # (identical to forwarding the trunk every step, ~100x faster)
    tmodel.eval()
    (xtr, ytr), (xte, yte) = train, test

    def feats(x_np):
        out = []
        with torch.no_grad():
            for b in range(0, len(x_np), BATCH):
                x = torch.from_numpy(x_np[b:b + BATCH].transpose(0, 3, 1, 2))
                out.append(tmodel.forward_features(x).numpy())
        return np.concatenate(out)

    ftr, fte = feats(xtr), feats(xte)
    # per-dim standardization with train stats (each framework from its own
    # features).  The mini-pretrained trunk's features on this OOD split are
    # a large shared vector plus a small class delta — separable (the
    # centroid check below is 1.0) but untrainable raw: the delta-direction
    # CE gradient drowns in Adam's update noise at any workable lr.
    mu, sd = ftr.mean(0), ftr.std(0) + 1e-6
    ftr, fte = (ftr - mu) / sd, (fte - mu) / sd
    centroids = np.stack([ftr[ytr == c].mean(0) for c in range(NUM_CLASSES)])
    nc_acc = float((np.argmin(
        ((fte[:, None] - centroids[None]) ** 2).sum(-1), -1) == yte).mean())
    print(f"[torch probe] nearest-centroid feature separability: {nc_acc:.4f}")

    head = torch.nn.Linear(ftr.shape[1], NUM_CLASSES)
    with torch.no_grad():
        head.weight.copy_(torch.from_numpy(head_init["weight"]))
        head.bias.copy_(torch.from_numpy(head_init["bias"]))
    opt = torch.optim.AdamW(head.parameters(), lr=LR, weight_decay=0.0)
    # LN features have ||f|| ~ sqrt(dim): constant-lr Adam jolts the logits
    # by ~0.8/step and plateaus at the chance-loss noise floor — decay to 0
    # (same closed-form cosine on both sides) so the head converges
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=EPOCHS * (N_TRAIN // BATCH))

    losses = []
    t0 = time.perf_counter()
    for ep in range(EPOCHS):
        ep_loss = 0.0
        for b in range(0, N_TRAIN, BATCH):
            f = torch.from_numpy(ftr[b:b + BATCH])
            y = torch.from_numpy(ytr[b:b + BATCH])
            loss = F.cross_entropy(head(f), y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
            ep_loss += float(loss.detach()) * len(y)
        losses.append(ep_loss / N_TRAIN)
        if ep % 25 == 0 or ep == EPOCHS - 1:
            print(f"[torch probe] epoch {ep}: loss {losses[-1]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)")

    with torch.no_grad():
        tr_acc = float((head(torch.from_numpy(ftr)).argmax(-1).numpy() == ytr).mean())
        preds = head(torch.from_numpy(fte)).argmax(-1).numpy()
    acc = float((preds == yte).mean())
    print(f"[torch probe] train accuracy {tr_acc:.4f}, test accuracy {acc:.4f}")
    return losses, acc, preds, head_init, nc_acc


def probe_jax(pth_path: Path, train, test, head_init):
    import jax
    import jax.numpy as jnp
    import optax

    from mmearth_tpu.checkpoints import torch_convert as tc
    from mmearth_tpu.models import convnextv2 as cnx

    # runs on the same backend stage A used (the platform cannot change
    # mid-process); HIGHEST precision keeps TPU f32 matmuls/convs unquantized
    # so the torch-CPU comparison is apples-to-apples
    jax.config.update("jax_default_matmul_precision", "highest")

    # the same .pth through the reference's remap (ours == theirs, golden
    # tested), then into our NHWC tree
    sd = tc.load_pth(pth_path)
    enc_sd = tc.remap_minkowski_keys(
        {k: v for k, v in sd.items()
         if not any(t in k for t in ("decoder", "mask_token", "proj", "pred", "loss_fn"))})
    params = jax.tree_util.tree_map(
        jnp.asarray, tc.torch_encoder_to_flax(enc_sd, DEPTHS))
    # identical fresh-head init (the torch side's trunc-normal 2e-5 head)
    params["head"] = {"kernel": jnp.asarray(head_init["weight"].T),
                      "bias": jnp.asarray(head_init["bias"])}

    jmodel = cnx.convnextv2_atto(
        img_size=IMG, patch_size=8, in_chans=IN_CH, num_classes=NUM_CLASSES,
        padding_mode="reference", dtype=jnp.float32)

    frozen = {k: v for k, v in params.items() if k != "head"}
    head = params["head"]
    (xtr, ytr), (xte, yte) = train, test

    # frozen trunk: precompute pooled+LN features once (same as torch side)
    @jax.jit
    def trunk(x):
        return jmodel.apply({"params": {**frozen, "head": head}}, x,
                            method="forward_features")

    def feats(x_np):
        return np.concatenate([
            np.asarray(trunk(jnp.asarray(x_np[b:b + BATCH])))
            for b in range(0, len(x_np), BATCH)])

    ftr, fte = feats(xtr), feats(xte)
    mu, sd = ftr.mean(0), ftr.std(0) + 1e-6   # same recipe as the torch side
    ftr, fte = (ftr - mu) / sd, (fte - mu) / sd

    tx = optax.adamw(
        optax.cosine_decay_schedule(LR, EPOCHS * (N_TRAIN // BATCH)),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(head)
    ftr_j, ytr_j = jnp.asarray(ftr), jnp.asarray(ytr)

    @jax.jit
    def step(head, opt_state, f, y):
        def lf(hp):
            logits = f @ hp["kernel"] + hp["bias"]
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

        loss, grads = jax.value_and_grad(lf)(head)
        updates, opt_state = tx.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    losses = []
    t0 = time.perf_counter()
    for ep in range(EPOCHS):
        ep_loss = 0.0
        for b in range(0, N_TRAIN, BATCH):
            head, opt_state, loss = step(
                head, opt_state, ftr_j[b:b + BATCH], ytr_j[b:b + BATCH])
            ep_loss += float(loss) * (min(b + BATCH, N_TRAIN) - b)
        losses.append(ep_loss / N_TRAIN)
        if ep % 25 == 0 or ep == EPOCHS - 1:
            print(f"[jax probe] epoch {ep}: loss {losses[-1]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)")

    preds = np.asarray(
        jnp.argmax(jnp.asarray(fte) @ head["kernel"] + head["bias"], -1))
    acc = float((preds == yte).mean())
    print(f"[jax probe] test accuracy {acc:.4f}")
    return losses, acc, preds


def main():
    args = [a for a in sys.argv[1:] if a != "--reuse-pth"]
    steps = int(args[0]) if args else 300
    pth_path = Path("/tmp/e2e_roundtrip.pth")

    if "--reuse-pth" in sys.argv and pth_path.exists():
        # stage A is deterministic (fixed seed): reuse this run's artifact
        print(f"[pretrain] reusing {pth_path}")
        final_loss = 20.3937  # the deterministic 300-step final loss
    else:
        final_loss = pretrain_and_export(steps, pth_path)
    train, test = make_probe_split()
    t_losses, t_acc, t_preds, head_init, nc_acc = probe_torch(pth_path, train, test)
    j_losses, j_acc, j_preds = probe_jax(pth_path, train, test, head_init)

    agree = float((t_preds == j_preds).mean())
    report = {
        "pretrain_steps": steps,
        "pretrain_final_loss": round(final_loss, 4),
        "probe": f"{EPOCHS} epochs x {N_TRAIN} train / {N_TEST} test, "
                 f"batch {BATCH}, AdamW lr {LR}, head-only",
        "train_losses_torch": [round(x, 4) for x in t_losses],
        "train_losses_jax": [round(x, 4) for x in j_losses],
        "feature_nearest_centroid_acc": round(nc_acc, 4),
        "test_acc_reference_torch": round(t_acc, 4),
        "test_acc_ours": round(j_acc, 4),
        "acc_delta_pts": round(abs(t_acc - j_acc) * 100, 2),
        "prediction_agreement": round(agree, 4),
        "ts": time.time(),
    }
    print(json.dumps(report, indent=1))
    (REPO / "E2E_ACCURACY.json").write_text(json.dumps(report, indent=1))

    ok = True
    if abs(t_acc - j_acc) > 0.03:
        print(f"FAIL: accuracy delta {abs(t_acc - j_acc):.3f} > 0.03")
        ok = False
    if t_acc < 0.3:
        print(f"FAIL: torch probe accuracy {t_acc:.3f} barely above chance — "
              "split not separable enough for a meaningful comparison")
        ok = False
    rel = max(abs(a - b) / abs(a) for a, b in zip(t_losses, j_losses))
    if rel > 0.05:
        print(f"FAIL: probe train losses diverged (max rel {rel:.3f})")
        ok = False
    print("e2e accuracy round-trip " + ("PASSED" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
