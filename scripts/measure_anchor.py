#!/usr/bin/env python
"""Measured anchor: the reference's OWN torch FCMAE vs this framework on the
same host CPU (round-1 verdict item 9 — replace the estimated GPU anchor with
a measured relative number).

Runs the reference dense FCMAE (112-16, the geometry where its dense path is
shape-consistent; imported as a black-box oracle via tests/_reference_oracle)
through forward+loss+backward+AdamW for K steps under torch, then the same
config through our jitted train step (leaky-dense `sparse=False` for an
apples-to-apples graph, and the sparse-emulation flagship path for context),
and prints one JSON line with samples/sec and the ratio.

Usage:  JAX_PLATFORMS=cpu python scripts/measure_anchor.py [--batch 8] [--steps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

# hard override: the session environment pins JAX_PLATFORMS to the TPU
# plugin (its sitecustomize even overrides a pre-import env assignment), and
# a TPU-vs-CPU ratio would be a dishonest "same-host" anchor.  The config
# update below is the only override that sticks.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


def torch_reference_sps(batch: int, steps: int, warmup: int = 2) -> float:
    import torch

    from _reference_oracle import load_reference
    from mmearth_tpu.configs import modalities as M

    ref = load_reference()
    torch.manual_seed(0)

    merged = dict(M.INP_MODALITIES)
    merged.update(M.OUT_MODALITIES)
    args = argparse.Namespace(
        modalities=merged,
        modalities_full=ref.MODALITIES.MODALITIES_FULL,
        out_modalities=M.OUT_MODALITIES,
        use_orig_stem=False,
        loss_aggr="uncertainty",
    )
    loss_fn = ref.custom_loss.UncertaintyWeightingStrategy(len(M.OUT_MODALITIES))
    model = ref.fcmae.convnextv2_atto(
        img_size=112, patch_size=16, mask_ratio=0.6, decoder_depth=1,
        decoder_embed_dim=512, norm_pix_loss=False, args=args, loss_fn=loss_fn,
        sparse=False,
    )
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1.5e-4, betas=(0.9, 0.95))

    g = torch.Generator().manual_seed(0)
    out_ch = M.out_channels(M.OUT_MODALITIES)
    batch_dict = {}
    for name in M.OUT_MODALITIES:
        if name in ("sentinel2", "sentinel1", "aster", "canopy_height_eth"):
            batch_dict[name] = torch.randn(batch, out_ch[name], 112, 112, generator=g)
        elif name in ("dynamic_world", "esa_worldcover"):
            hi = 9 if name == "dynamic_world" else 11
            batch_dict[name] = torch.randint(-1, hi, (batch, 1, 112, 112), generator=g)
        elif name == "biome":
            batch_dict[name] = torch.nn.functional.one_hot(
                torch.randint(0, 14, (batch,), generator=g), 14)
        elif name == "eco_region":
            batch_dict[name] = torch.nn.functional.one_hot(
                torch.randint(0, 846, (batch,), generator=g), 846)
        else:  # era5 / lat / lon / month
            batch_dict[name] = torch.randn(batch, out_ch[name], generator=g)

    def one_step():
        opt.zero_grad()
        loss, *_ = model(dict(batch_dict), mask_ratio=0.6)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def ours_sps(batch: int, steps: int, sparse: bool, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mmearth_tpu.models import fcmae as fcmae_lib
    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.step import TrainState, init_fcmae, make_pretrain_step

    model = ge._flagship(img_size=112, patch_size=16, dtype=jnp.float32)
    model = model.clone(sparse=sparse)
    batch_np = ge._synthetic_batch(batch, 112)
    batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}

    params = init_fcmae(model, 0, {k: v[:2] for k, v in batch_j.items()})
    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1.5e-4)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_pretrain_step(model, random_crop=False), donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    for _ in range(warmup):
        state, metrics = step_fn(state, batch_j, rng)
    float(metrics["loss"])  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_j, rng)
    float(metrics["loss"])  # sync
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--torch_sps", type=float, default=None,
                    help="reuse a previously measured torch samples/s")
    args = ap.parse_args()

    ref_sps = args.torch_sps or torch_reference_sps(args.batch, args.steps)
    ours_dense = ours_sps(args.batch, args.steps, sparse=False)
    ours_sparse = ours_sps(args.batch, args.steps, sparse=True)
    result = {
        "host": "cpu (same machine, 1 core)",
        "config": "fcmae atto 112-16 dense, batch %d, f32" % args.batch,
        "reference_torch_sps": round(ref_sps, 3),
        "ours_dense_sps": round(ours_dense, 3),
        "ours_sparse_emulation_sps": round(ours_sparse, 3),
        "speedup_dense_vs_reference": round(ours_dense / ref_sps, 3),
        "speedup_sparse_vs_reference": round(ours_sparse / ref_sps, 3),
        "note": "same-host CPU measurement anchoring the reference's "
                "absolute throughput; CPU is not this framework's target "
                "(XLA:CPU single-core conv kernels trail torch's) — compare "
                "reference_torch_sps against the TPU samples/s in bench.py "
                "output for the cross-platform headline",
    }
    print(json.dumps(result))
    out = Path(__file__).resolve().parent.parent / "ANCHOR.json"
    out.write_text(json.dumps(result, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
