"""Chained dispatch (steps_per_dispatch=k) on the 8-device mesh: the stacked
superbatch must carry the data-axis sharding (axis 1 of (k, B, ...)) and k
chained steps must train identically to k separate dispatches."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import __graft_entry__ as ge
from mmearth_tpu.parallel import mesh as mesh_lib
from mmearth_tpu.train import optim as optim_lib
from mmearth_tpu.train.step import (
    TrainState, init_fcmae, make_chained_step, make_pretrain_step,
)
import pytest

pytestmark = pytest.mark.slow


def _mini_fcmae():
    """Tiny FCMAE (2 output modalities, 4 narrow blocks) — the full atto model
    takes minutes to compile on the CPU sim and adds nothing to this test."""
    import jax.numpy as jnp

    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.models.fcmae import FCMAE

    return FCMAE(
        img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        decoder_depth=1, decoder_embed_dim=32, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES,
        out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"],
                        "biome": M.OUT_MODALITIES["biome"]},
        dtype=jnp.float32,
    )


def test_chained_k2_matches_sequential_on_mesh():
    assert jax.device_count() == 8
    mesh = mesh_lib.create_mesh(data=8, model=1)
    model = _mini_fcmae()
    batch_np = ge._synthetic_batch(16, 40)  # 2 steps x global batch 8
    batch_np = {k: v for k, v in batch_np.items() if k in ("sentinel2", "biome")}

    params = init_fcmae(model, 0, {k: jnp.asarray(v[:2]) for k, v in batch_np.items()})
    params = mesh_lib.shard_params(params, mesh)
    tx = optim_lib.make_pretrain_optimizer(params, lambda s: 1e-3)
    state0 = TrainState.create(params, tx)
    rng = jax.random.PRNGKey(0)

    # k separate dispatches
    step_fn = jax.jit(make_pretrain_step(model, random_crop=True))
    s_seq = state0
    m_seq = None
    for i in range(2):
        b = {k: v[i * 8 : (i + 1) * 8] for k, v in batch_np.items()}
        s_seq, m_seq = step_fn(s_seq, mesh_lib.shard_batch(b, mesh), rng)

    # one chained dispatch over the stacked (2, 8, ...) superbatch
    stacked = {k: v.reshape(2, 8, *v.shape[1:]) for k, v in batch_np.items()}
    sharded = mesh_lib.shard_batch(stacked, mesh, axis=1)
    assert sharded["sentinel2"].sharding.spec == P(None, "data")
    chained = jax.jit(make_chained_step(make_pretrain_step(model, random_crop=True), 2))
    s_chn, metrics = chained(state0, sharded, rng)

    assert int(s_seq.step) == int(s_chn.step) == 2
    # same data + same per-step rng keys: the second step's loss must agree
    np.testing.assert_allclose(float(m_seq["loss"]), float(metrics["loss"]), rtol=1e-4)
    # params agree up to scan-vs-unrolled float re-association (adam divides
    # by sqrt(nu), amplifying ulp-level grad differences near zero)
    flat_a = jax.tree_util.tree_leaves_with_path(s_seq.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(s_chn.params))
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )
