"""Numeric equivalence of the tensor-parallel 'model' mesh axis.

The 'model' axis shards the 4x pointwise-expansion and prediction-head
channels (parallel/mesh.py::param_sharding_rules).  The data axis is proven
equal to a single-process run by tests/test_multihost.py; this file proves the
TP axis: the SAME batch + seed stepped on meshes (8,1), (4,2), (2,4) and on a
single device must produce the same losses and the same updated parameters
(GSPMD partitioning must be semantics-preserving; a wrong-but-finite sharding
rule would diverge here).  Replaces the implicit correctness DDP had in the
reference (/root/reference/helpers.py:376-401), which never exercised TP at
all.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from mmearth_tpu.configs import modalities as M
from mmearth_tpu.models.fcmae import FCMAE
from mmearth_tpu.parallel import mesh as mesh_lib
from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.step import TrainState, init_fcmae, make_pretrain_step

N_STEPS = 2
BATCH = 8


def _mini_model():
    return FCMAE(
        img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        decoder_depth=1, decoder_embed_dim=32, sparse=True,
        loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES,
        out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"],
                        "biome": M.OUT_MODALITIES["biome"]},
        dtype=jnp.float32,
    )


def _run(data_axis: int, model_axis: int):
    """Step the mini FCMAE N_STEPS times on a (data, model) mesh; returns
    (per-step losses, updated pwconv1 kernel — a leaf the TP rules shard)."""
    model = _mini_model()
    n_dev = data_axis * model_axis
    mesh = mesh_lib.create_mesh(
        data=data_axis, model=model_axis, devices=jax.devices()[:n_dev])
    batch_np = ge._synthetic_batch(BATCH, 40, rng_seed=11)
    batch_np = {k: v for k, v in batch_np.items() if k in ("sentinel2", "biome")}
    params = init_fcmae(model, 0, {k: jnp.asarray(v[:2]) for k, v in batch_np.items()})
    params = mesh_lib.shard_params(params, mesh)
    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-3)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_pretrain_step(model, random_crop=True))
    data = mesh_lib.shard_batch(batch_np, mesh)
    losses = []
    for i in range(N_STEPS):
        state, metrics = step_fn(state, data, jax.random.fold_in(jax.random.PRNGKey(3), i))
        losses.append(float(metrics["loss"]))
    leaf = np.asarray(state.params["encoder"]["stages_0_0"]["pwconv1"]["kernel"])
    return np.array(losses), leaf


def test_tp_rules_actually_shard():
    """Guard: the leaf compared below is genuinely split over 'model' (else
    the equivalence test would only re-prove data parallelism), and channel
    counts not divisible by the axis size stay replicated (the 14-way biome
    head on model=4 must not be split)."""
    P = jax.sharding.PartitionSpec
    spec = mesh_lib.param_sharding_rules(
        "encoder/stages_0_0/pwconv1/kernel", (8, 32), model_size=2)
    assert spec == P(None, "model"), spec
    assert mesh_lib.param_sharding_rules(
        "encoder/stages_0_0/dwconv/kernel", (7, 7, 1, 8), model_size=2) == P()
    assert mesh_lib.param_sharding_rules(
        "decoder/pred_biome/bias", (14,), model_size=4) == P()
    assert mesh_lib.param_sharding_rules(
        "decoder/pred_biome/bias", (14,), model_size=2) == P("model")


@pytest.mark.parametrize("data_axis,model_axis", [(8, 1), (4, 2), (2, 4)])
def test_model_axis_matches_single_device(data_axis, model_axis):
    ref_losses, ref_leaf = _run(1, 1)
    losses, leaf = _run(data_axis, model_axis)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    np.testing.assert_allclose(leaf, ref_leaf, rtol=1e-4, atol=1e-6)
