"""--opt optimizer families (reference optim_factory.py:149-252).

sgd/momentum/nesterov/adam/adamw/rmsprop are checked for exact trajectory
parity against the corresponding torch optimizers (the semantics the
reference's create_optimizer produces: coupled L2 for everything except
AdamW, weight decay only on the decay param group).  The remaining families
are smoke-checked (finite steps, state updates, unsupported names raise).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.train import optim as optim_lib


def _problem():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    return w, b, x, y


def _jax_run(opt, steps, lr, wd, betas=(0.9, 0.999), momentum=0.9, eps=1e-8):
    w0, b0, x, y = _problem()
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = optim_lib.make_finetune_optimizer(
        params, lambda _: lr, weight_decay=wd, betas=betas, layer_decay=1.0,
        opt=opt, opt_eps=eps, momentum=momentum,
    )
    state = tx.init(params)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        pred = xj @ p["dense"]["kernel"] + p["dense"]["bias"]
        return jnp.mean((pred - yj) ** 2)

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return np.asarray(params["dense"]["kernel"]), np.asarray(params["dense"]["bias"])


def _torch_run(make_opt, steps, wd):
    import torch

    w0, b0, x, y = _problem()
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    b = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    # reference param groups: >1-dim decayed, bias not (optim_factory.py:108-119)
    opt = make_opt([{"params": [w], "weight_decay": wd},
                    {"params": [b], "weight_decay": 0.0}])
    for _ in range(steps):
        opt.zero_grad()
        ((xt @ w + b - yt) ** 2).mean().backward()
        opt.step()
    return w.detach().numpy(), b.detach().numpy()


STEPS, LR, WD = 5, 0.05, 0.3


@pytest.mark.parametrize("opt,make_torch", [
    ("sgd", lambda groups: __import__("torch").optim.SGD(groups, lr=LR, momentum=0.9, nesterov=True)),
    ("nesterov", lambda groups: __import__("torch").optim.SGD(groups, lr=LR, momentum=0.9, nesterov=True)),
    ("momentum", lambda groups: __import__("torch").optim.SGD(groups, lr=LR, momentum=0.9, nesterov=False)),
    ("adam", lambda groups: __import__("torch").optim.Adam(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)),
    ("adamw", lambda groups: __import__("torch").optim.AdamW(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)),
    ("fusedadam", lambda groups: __import__("torch").optim.Adam(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)),
    ("rmsprop", lambda groups: __import__("torch").optim.RMSprop(groups, lr=LR, alpha=0.9, eps=1e-8, momentum=0.9)),
])
def test_torch_trajectory_parity(opt, make_torch):
    wj, bj = _jax_run(opt, STEPS, LR, WD)
    wt, bt = _torch_run(make_torch, STEPS, WD)
    np.testing.assert_allclose(wj, wt, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(bj, bt, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("opt", ["nadam", "radam", "adadelta", "adafactor",
                                 "novograd", "nvnovograd", "lamb", "rmsproptf"])
def test_optax_families_step(opt):
    w0, b0, _, _ = _problem()
    wj, bj = _jax_run(opt, 3, 0.01, 0.1)
    assert np.all(np.isfinite(wj)) and np.all(np.isfinite(bj))
    assert not np.allclose(wj, w0)  # the optimizer actually moved the params


def test_unsupported_raises():
    params = {"w": jnp.ones((2, 2))}
    with pytest.raises(ValueError, match="adahessian"):
        optim_lib.make_finetune_optimizer(params, lambda _: 0.1, opt="adahessian")


def test_novograd_matches_optax_alias():
    """Our novograd chain (wd after the per-layer normalization, partitioned
    by the wd mask) must match optax.novograd exactly when every leaf is in
    the decay group."""
    import optax

    w0, _, x, y = _problem()
    lr, wd = 0.05, 0.3
    # all-decayed tree: a single >1-dim kernel leaf
    params = {"dense": {"kernel": jnp.asarray(w0)}}
    tx_ref = optax.novograd(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    tx_ours = optim_lib.make_finetune_optimizer(
        params, lambda _: lr, weight_decay=wd, betas=(0.9, 0.999),
        layer_decay=1.0, opt="novograd")
    s_ref, s_ours = tx_ref.init(params), tx_ours.init(params)
    p_ref = p_ours = params
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        return jnp.mean((xj @ p["dense"]["kernel"] - yj) ** 2)

    for _ in range(4):
        u, s_ref = tx_ref.update(jax.grad(loss_fn)(p_ref), s_ref, p_ref)
        p_ref = jax.tree_util.tree_map(lambda p, d: p + d, p_ref, u)
        u, s_ours = tx_ours.update(jax.grad(loss_fn)(p_ours), s_ours, p_ours)
        p_ours = jax.tree_util.tree_map(lambda p, d: p + d, p_ours, u)
    np.testing.assert_allclose(np.asarray(p_ours["dense"]["kernel"]),
                               np.asarray(p_ref["dense"]["kernel"]),
                               rtol=1e-6, atol=1e-7)
