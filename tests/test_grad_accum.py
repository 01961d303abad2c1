"""Gradient accumulation (update_freq) parity: k micro-steps with
optax.MultiSteps must equal one step on the concatenated batch (the
reference's engine accumulation, engine_pretrain.py:87-96)."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.step import TrainState


def test_multisteps_matches_big_batch():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    params = {"w": w}
    x_big = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    y_big = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

    def loss(p, x, y):
        return jnp.mean(jnp.square(x @ p["w"] - y))

    sched = lambda step: 1e-2

    # one big-batch step
    tx1 = optim_lib.make_pretrain_optimizer(params, sched, weight_decay=0.05, update_freq=1)
    s1 = TrainState.create(params, tx1)
    g = jax.grad(loss)(s1.params, x_big, y_big)
    s1 = s1.apply_gradients(g)

    # two micro-steps with update_freq=2 (mean of micro grads == big grad
    # since both microbatches are the same size)
    tx2 = optim_lib.make_pretrain_optimizer(params, sched, weight_decay=0.05, update_freq=2)
    s2 = TrainState.create(params, tx2)
    for lo, hi in ((0, 8), (8, 16)):
        g = jax.grad(loss)(s2.params, x_big[lo:hi], y_big[lo:hi])
        s2 = s2.apply_gradients(g)

    np.testing.assert_allclose(np.asarray(s1.params["w"]), np.asarray(s2.params["w"]), rtol=1e-5, atol=1e-6)

    # params must be unchanged after the first (non-update) micro step
    tx3 = optim_lib.make_pretrain_optimizer(params, sched, weight_decay=0.05, update_freq=2)
    s3 = TrainState.create(params, tx3)
    g = jax.grad(loss)(s3.params, x_big[:8], y_big[:8])
    s3b = s3.apply_gradients(g)
    np.testing.assert_array_equal(np.asarray(s3.params["w"]), np.asarray(s3b.params["w"]))


def test_ema_updates_only_on_real_optimizer_steps():
    """With update_freq=k, the EMA must stay fixed on accumulation-only
    micro-steps and decay exactly once per applied update (the reference's
    engine calls model_ema.update per real update)."""
    from flax import linen as nn

    from mmearth_tpu.train.finetune import make_finetune_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True, rngs=None):
            return nn.Dense(3)(x.reshape(x.shape[0], -1))

    model = Tiny()
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 4, 4, 2))
    params = model.init(rng, x)["params"]

    def criterion(logits, y):
        return jnp.mean(jnp.square(logits - y))

    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-1, update_freq=2)
    state = TrainState.create(
        params, tx, ema_params=jax.tree_util.tree_map(jnp.asarray, params))
    step = make_finetune_step(model, criterion, is_seg=False,
                              ema_decay=0.5, update_freq=2)
    batch = {"input": x, "label": jnp.ones((2, 3))}

    s1, _ = step(state, batch, rng)
    # micro-step 1: no optimizer update -> EMA bitwise unchanged
    np.testing.assert_array_equal(
        np.asarray(s1.ema_params["Dense_0"]["kernel"]),
        np.asarray(state.ema_params["Dense_0"]["kernel"]))

    s2, _ = step(s1, batch, rng)
    # micro-step 2: update applied -> ema = 0.5*ema + 0.5*new_params
    want = 0.5 * np.asarray(state.ema_params["Dense_0"]["kernel"]) + \
        0.5 * np.asarray(s2.params["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(s2.ema_params["Dense_0"]["kernel"]), want, rtol=1e-6)
