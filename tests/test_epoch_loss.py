"""Exact epoch-mean loss (round-4 item 6): the pretrain driver fetches
metrics only at print cadence (dispatch latency), so the logged epoch average
used to weight each fetched loss by print_freq — a ~1/20 subsample of steps
where the reference averages all of them (engine_pretrain.py:104-113).  The
fix accumulates the loss sum on device (TrainState.loss_sum, step.py) and
fetches it once per epoch.  These tests prove (a) the accumulator equals the
sum of the per-step losses for both single and chained dispatch, and (b) the
driver-reported epoch loss equals the true all-steps mean seen by a
per-step-fetching meter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.step import (
    TrainState, init_fcmae, make_chained_step, make_pretrain_step,
)


def _mini_fcmae():
    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.models.fcmae import FCMAE

    return FCMAE(
        img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        decoder_depth=1, decoder_embed_dim=32, sparse=True, loss_aggr="unweighted",
        inp_modalities=M.INP_MODALITIES,
        out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"]},
        dtype=jnp.float32,
    )


def test_loss_sum_accumulates_every_step():
    model = _mini_fcmae()
    batch_np = ge._synthetic_batch(8, 40)
    batch_np = {"sentinel2": batch_np["sentinel2"]}

    params = init_fcmae(model, 0, {k: jnp.asarray(v[:2]) for k, v in batch_np.items()})
    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-3)
    state = TrainState.create(params, tx).replace(loss_sum=jnp.zeros((), jnp.float32))
    rng = jax.random.PRNGKey(0)
    step_fn = jax.jit(make_pretrain_step(model, random_crop=True))

    losses = []
    for i in range(4):
        b = {k: jnp.asarray(v[2 * (i % 4) : 2 * (i % 4) + 2]) for k, v in batch_np.items()}
        state, m = step_fn(state, b, rng)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(float(state.loss_sum), sum(losses), rtol=1e-6)

    # chained dispatch accumulates all k losses, not just the returned last one
    state2 = TrainState.create(params, tx).replace(loss_sum=jnp.zeros((), jnp.float32))
    chained = jax.jit(make_chained_step(make_pretrain_step(model, random_crop=True), 2))
    stacked = {k: jnp.asarray(v.reshape(2, 2, *v.shape[1:])) for k, v in
               {kk: vv[:4] for kk, vv in batch_np.items()}.items()}
    state2, m2 = chained(state2, stacked, rng)
    state2, m2b = chained(state2, jax.tree_util.tree_map(lambda x: x, stacked), rng)
    assert float(state2.loss_sum) > float(m2b["loss"])  # more than the last step alone
    # exact: replay the same 4 steps singly
    state3 = TrainState.create(params, tx).replace(loss_sum=jnp.zeros((), jnp.float32))
    for _ in range(2):
        for i in range(2):
            b = jax.tree_util.tree_map(lambda x: x[i], stacked)
            state3, _ = step_fn(state3, b, rng)
    np.testing.assert_allclose(float(state2.loss_sum), float(state3.loss_sum), rtol=1e-6)


@pytest.mark.slow
def test_driver_epoch_loss_is_true_mean(tmp_path):
    """Run the real driver with a per-step-fetching meter (print_freq=1, which
    covers every step exactly once) and assert the reported epoch loss — now
    sourced from the device accumulator — equals the meter's all-steps mean."""
    import main_pretrain
    from mmearth_tpu.data.synthetic import generate
    from mmearth_tpu.train import pretrain as pt
    from mmearth_tpu.utils.logging import MetricLogger

    synth = generate(tmp_path / "mmearth", n=24, tile=64, seed=0)
    captured = []

    class EveryStepLogger(MetricLogger):
        def __init__(self, *a, **k):
            k["print_freq"] = 1
            super().__init__(*a, **k)
            captured.append(self)

    args = main_pretrain.get_args_parser().parse_args(
        [
            "--data_dir", str(synth),
            "--processed_dir", str(tmp_path / "proc"),
            "--model", "convnextv2_atto",
            "--input_size", "56", "--patch_size", "8",
            "--batch_size", "1", "--epochs", "1", "--warmup_epochs", "1",
            "--use_bf16", "False",
        ]
    )
    orig = pt.MetricLogger
    pt.MetricLogger = EveryStepLogger
    try:
        _state, history = main_pretrain.main(args)
    finally:
        pt.MetricLogger = orig

    meter_mean = captured[-1].meters["loss"].avg  # true per-step mean (host f64)
    np.testing.assert_allclose(history[0]["loss"], meter_mean, rtol=1e-5)
