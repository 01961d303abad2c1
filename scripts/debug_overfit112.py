#!/usr/bin/env python
"""Debug the 112-16 tiny-batch overfit NaN (seen in
test_padding_deviation_on_trained_weights): print per-modality losses and
log-vars per step to find which pretext component blows up.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_overfit112.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from mmearth_tpu.configs import modalities as M
from mmearth_tpu.models import fcmae as fc_lib
from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.schedule import warmup_cosine
from mmearth_tpu.train.step import TrainState, init_fcmae, make_pretrain_step

IMG, PATCH = 112, 16


def main():
    model = fc_lib.convnextv2_atto(
        img_size=IMG, patch_size=PATCH, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
    )
    rng = np.random.default_rng(0)
    n = 4
    batch = {}
    out_ch = M.out_channels(M.OUT_MODALITIES)
    for name in ("sentinel2", "sentinel1", "aster", "canopy_height_eth"):
        batch[name] = jnp.asarray(
            rng.normal(size=(n, IMG, IMG, out_ch[name])).astype(np.float32))
    for name, hi in (("dynamic_world", 9), ("esa_worldcover", 11)):
        batch[name] = jnp.asarray(
            rng.integers(0, hi, size=(n, IMG, IMG, 1)).astype(np.int32))
    for name in ("lat", "lon", "month", "era5"):
        batch[name] = jnp.asarray(
            rng.normal(size=(n, out_ch[name])).astype(np.float32))
    batch["biome"] = jnp.asarray(np.eye(14, dtype=np.int32)[rng.integers(0, 14, n)])
    batch["eco_region"] = jnp.asarray(np.eye(846, dtype=np.int32)[rng.integers(0, 846, n)])

    params = init_fcmae(model, 0, batch)
    tx = optim_lib.make_pretrain_optimizer(params, warmup_cosine(2e-4, 0, 100, 2, 10))
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, random_crop=False)
    jstep = jax.jit(step, donate_argnums=(0,))

    key = jax.random.PRNGKey(0)
    for i in range(40):
        state, m = jstep(state, batch, jax.random.fold_in(key, i))
        loss = float(m["loss"])
        per_mod = {k: float(v) for k, v in m.items() if k.startswith("loss_")}
        lv = np.asarray(m.get("log_vars", np.zeros(1)))
        bad = [k for k, v in per_mod.items() if not np.isfinite(v)]
        print(f"step {i:2d}  loss {loss:10.4f}  logvar[min,max]=({lv.min():.3f},{lv.max():.3f})"
              + (f"  NONFINITE: {bad}" if bad or not np.isfinite(loss) else ""))
        if bad or not np.isfinite(loss):
            for k, v in sorted(per_mod.items()):
                print(f"    {k:28s} {v:.6f}")
            break


if __name__ == "__main__":
    main()
