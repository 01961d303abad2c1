"""Every accepted CLI flag must change behavior (round-1 verdict item 4):
--clip_grad enters the optax chain (reference main_finetune.py:629,
helpers.py:476-500), --resume <path> restores an explicit checkpoint
(helpers.py:568-610), --num_workers drives the native gather threads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmearth_tpu.checkpoints.orbax_io import CheckpointIO, restore_explicit
from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.step import TrainState


def _run_chain(tx, params, grads_seq):
    st = tx.init(params)
    for g in grads_seq:
        u, st = tx.update(g, st, params)
        params = optax.apply_updates(params, u)
    return params


def test_clip_grad_pretrain_matches_preclipped():
    """The clipped chain on raw grads == the unclipped chain on grads that were
    pre-clipped by global norm (the reference's unscale-then-clip order)."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    sched = lambda s: 1e-2
    g1 = {"w": jnp.full((4, 4), 0.05), "b": jnp.full((4,), 0.01)}
    g2 = {"w": jnp.full((4, 4), 25.0), "b": jnp.full((4,), 10.0)}

    def preclip(g, c=1.0):
        n = optax.global_norm(g)
        s = jnp.minimum(1.0, c / n)
        return jax.tree_util.tree_map(lambda x: x * s, g)

    tx_c = optim_lib.make_pretrain_optimizer(params, sched, weight_decay=0.0, clip_grad=1.0)
    tx_n = optim_lib.make_pretrain_optimizer(params, sched, weight_decay=0.0)
    p_clip = _run_chain(tx_c, params, [g1, g2])
    p_pre = _run_chain(tx_n, params, [preclip(g1), preclip(g2)])
    p_raw = _run_chain(tx_n, params, [g1, g2])
    for k in params:
        np.testing.assert_allclose(np.asarray(p_clip[k]), np.asarray(p_pre[k]), rtol=1e-6)
    # and it actually changes the trajectory vs no clipping
    assert not np.allclose(np.asarray(p_clip["w"]), np.asarray(p_raw["w"]))


def test_clip_grad_finetune_ignores_frozen():
    """Frozen leaves are zeroed before the norm, so a huge gradient on a frozen
    leaf must not shrink the trainable update (torch only sees requires_grad
    params in the clip norm)."""
    params = {"head": {"w": jnp.ones((3, 3))}, "trunk": {"w": jnp.ones((3, 3))}}
    mask = optim_lib.zero_grads_mask(params, lambda p: p.startswith("head"))
    tx = optim_lib.make_finetune_optimizer(
        params, lambda s: 1e-2, weight_decay=0.0, trainable_mask=mask, clip_grad=1.0
    )
    g_small = jnp.full((3, 3), 0.1)
    g_huge = jnp.full((3, 3), 1e4)
    u1, _ = tx.update({"head": {"w": g_small}, "trunk": {"w": g_huge}}, tx.init(params), params)
    u2, _ = tx.update({"head": {"w": g_small}, "trunk": {"w": jnp.zeros((3, 3))}}, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(u1["head"]["w"]), np.asarray(u2["head"]["w"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(u1["trunk"]["w"]), 0.0)


def test_save_ckpt_freq_misaligned_epochs_still_save(tmp_path):
    """The drivers replicate the reference's save cadence — epochs freq-1,
    2*freq-1, ... ((epoch+1) % freq == 0, main_pretrain.py:354).  Orbax's
    own FixedIntervalPolicy accepts `epoch % interval == 0`, so passing the
    freq through as save_interval_steps silently rejected every non-initial
    save (and the rolling prune then deleted the loader file of the only
    epoch that had a checkpoint).  CheckpointIO must accept every
    driver-requested save and keep loader files only beside real
    checkpoints."""
    params = {"w": jnp.arange(4.0)}
    state = TrainState.create(params, optax.sgd(0.1))
    io = CheckpointIO(tmp_path, max_to_keep=3, save_interval=2)
    for epoch in (1, 3, 5):  # the driver cadence at save_ckpt_freq=2
        io.save(epoch, state, loader_state=f"pos{epoch}".encode())
    io.wait()
    assert io.latest_epoch() == 5
    assert sorted(io.manager.all_steps()) == [1, 3, 5]
    assert io.loader_state(5) == b"pos5"
    assert io.loader_state(1) == b"pos1"  # within max_to_keep, not pruned
    assert not list(io.directory.glob("*.tmp"))  # loader writes are atomic


def test_restore_explicit_paths(tmp_path):
    params = {"w": jnp.arange(4.0)}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    io = CheckpointIO(tmp_path, max_to_keep=3)
    io.save(0, state)
    io.save(1, state.replace(params={"w": state.params["w"] + 1.0}, step=state.step + 5))
    io.wait()

    def fresh():
        return TrainState.create(params, tx)

    # run output dir -> latest epoch
    s, e = restore_explicit(fresh(), tmp_path)
    assert e == 1 and int(s.step) == 5
    np.testing.assert_array_equal(np.asarray(s.params["w"]), np.arange(4.0) + 1.0)
    # checkpoints root
    s, e = restore_explicit(fresh(), tmp_path / "checkpoints")
    assert e == 1
    # a specific epoch dir
    s, e = restore_explicit(fresh(), tmp_path / "checkpoints" / "0")
    assert e == 0 and int(s.step) == 0
    np.testing.assert_array_equal(np.asarray(s.params["w"]), np.arange(4.0))
    # missing path is an error, not a silent fresh start
    with pytest.raises(FileNotFoundError):
        restore_explicit(fresh(), tmp_path / "nope")


def test_num_workers_gather_identical(tmp_path):
    from mmearth_tpu.data.loader import PackedDataset, PackedLoader
    from mmearth_tpu.data.pack import pack_split

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 6, 6, 3)).astype(np.float32)

    class _Items:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": x[i], "id": str(i)}

    dest = pack_split(_Items(), tmp_path / "pack", log_every=0)
    ds = PackedDataset(dest)
    rows = np.asarray([3, 1, 30, 7, 7, 0])
    for n in (1, 4):
        np.testing.assert_array_equal(ds.gather(rows, n)["x"], ds.gather(rows, 0)["x"])

    b0 = [b["x"] for b in PackedLoader(ds, 8, shuffle=True, seed=1, num_workers=0)]
    b4 = [b["x"] for b in PackedLoader(ds, 8, shuffle=True, seed=1, num_workers=4)]
    for a, b in zip(b0, b4):
        np.testing.assert_array_equal(a, b)


def test_gelu_approx_changes_little():
    """--gelu_approx: tanh GELU deviates from exact erf by ~1e-3 relative."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmearth_tpu.models import convnextv2 as cn

    kw = dict(patch_size=8, img_size=56, in_chans=3, num_classes=5,
              depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), sparse=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    m_exact = cn.ConvNeXtV2(gelu_approx=False, **kw)
    m_tanh = cn.ConvNeXtV2(gelu_approx=True, **kw)
    params = m_exact.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    y0 = np.asarray(m_exact.apply({"params": params}, x))
    y1 = np.asarray(m_tanh.apply({"params": params}, x))
    assert not np.array_equal(y0, y1)  # the flag does something
    rel = np.abs(y0 - y1).max() / (np.abs(y0).max() + 1e-12)
    assert rel < 5e-2, rel  # ...but stays a small perturbation


def test_opt_flag_reaches_optimizer():
    """--opt/--opt_eps/--momentum flow façade -> config -> builder, and a
    reference-style command line with the full torch flag surface parses."""
    import main_finetune

    args = main_finetune.get_args_parser().parse_args(
        ["--data_set", "m-eurosat", "--opt", "sgd", "--momentum", "0.8",
         "--opt_eps", "1e-7", "--use_amp", "True", "--mixup", "0.8",
         "--reprob", "0.25", "--aa", "rand-m9-mstd0.5-inc1",
         "--model_key", "model", "--warmup_steps", "100"]
    )
    cfg = main_finetune.config_from_args(args)
    assert cfg.optim.opt == "sgd"
    assert cfg.optim.momentum == 0.8
    assert cfg.optim.opt_eps == 1e-7

    params = {"w": jnp.ones((3, 3))}
    tx_sgd = optim_lib.make_finetune_optimizer(
        params, lambda _: 0.1, opt=cfg.optim.opt, momentum=cfg.optim.momentum)
    tx_adamw = optim_lib.make_finetune_optimizer(params, lambda _: 0.1)
    g = {"w": jnp.full((3, 3), 0.2)}
    u_sgd, _ = tx_sgd.update(g, tx_sgd.init(params), params)
    u_adamw, _ = tx_adamw.update(g, tx_adamw.init(params), params)
    assert not np.allclose(np.asarray(u_sgd["w"]), np.asarray(u_adamw["w"]))
