"""MaskedGRN statistic scope (round-1 verdict weak item 5).

The reference's MinkowskiGRN computes its L2 statistic over the active sites
of *one GPU's* batch (sparse_norm_layers.py:28-33 under DDP); our masked-dense
emulation defaults to the global batch.  ``group=per_device_batch`` must
reproduce the per-shard semantics exactly, and the global-vs-per-device
divergence is measured here (documented in PARITY.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.models.norm import MaskedGRN


def _rand_params(rng, dim):
    return {
        "gamma": jnp.asarray(rng.normal(size=(dim,)).astype(np.float32)),
        "beta": jnp.asarray(rng.normal(size=(dim,)).astype(np.float32)),
    }


def test_masked_grn_group_equals_independent_shards():
    """group=G output == concatenation of independent per-G-shard GRNs (the
    per-GPU DDP computation)."""
    rng = np.random.default_rng(0)
    dim, n, g = 16, 8, 4
    x = jnp.asarray(rng.normal(size=(n, 6, 6, dim)).astype(np.float32))
    keep = jnp.asarray((rng.random((n, 6, 6, 1)) > 0.5).astype(np.float32))
    params = _rand_params(rng, dim)

    grouped = MaskedGRN(dim, group=g).apply({"params": params}, x, keep)
    per_shard = jnp.concatenate([
        MaskedGRN(dim, group=0).apply({"params": params}, x[i : i + g], keep[i : i + g])
        for i in range(0, n, g)
    ])
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(per_shard), rtol=1e-6, atol=1e-6)

    # group=0 and group=n are the same (global) statistic
    g0 = MaskedGRN(dim, group=0).apply({"params": params}, x, keep)
    gn = MaskedGRN(dim, group=n).apply({"params": params}, x, keep)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(gn))

    # non-divisible group falls back to global rather than mis-grouping
    g3 = MaskedGRN(dim, group=3).apply({"params": params}, x, keep)
    np.testing.assert_array_equal(np.asarray(g3), np.asarray(g0))


@pytest.mark.slow
def test_grn_scope_divergence_measured():
    """Quantify global-batch vs per-device GRN stats on the flagship encoder:
    the divergence must be small (the statistic is a mean over thousands of
    active sites; shard size 8 of 32 changes it by O(1/sqrt(sites)))."""
    import __graft_entry__ as ge
    from mmearth_tpu.models import fcmae as fcmae_lib

    n = 32
    batch = {k: jnp.asarray(v) for k, v in ge._synthetic_batch(n, 56).items()}
    batch = fcmae_lib.zero_nan_inputs(batch)

    m_global = ge._flagship(dtype=jnp.float32)
    m_dev = m_global.clone(grn_group=8)  # 4 'devices' of 8 samples each
    variables = m_global.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch
    )

    # GRN gamma/beta init to zero (identity GRN), which would make the scopes
    # trivially equal; randomize them to measure the trained-network regime
    def randomize_grn(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        if "grn" in keys and keys[-1] in ("gamma", "beta"):
            seed = abs(hash("/".join(keys))) % (2 ** 31)
            return jnp.asarray(
                np.random.default_rng(seed).normal(scale=0.5, size=leaf.shape).astype(np.float32)
            )
        return leaf

    variables = {"params": jax.tree_util.tree_map_with_path(randomize_grn, variables["params"])}

    def run(m):
        loss, _p, _mask, loss_dict, _lv, _w = m.apply(
            variables, batch, rngs={"mask": jax.random.PRNGKey(2)}
        )
        return float(loss), {k: float(v) for k, v in loss_dict.items()}

    loss_g, dict_g = run(m_global)
    loss_d, dict_d = run(m_dev)
    rel = abs(loss_g - loss_d) / abs(loss_g)
    per_mod = {k: abs(dict_g[k] - dict_d[k]) / (abs(dict_g[k]) + 1e-12) for k in dict_g}
    print(f"GRN scope divergence: total loss rel {rel:.2e}; per-modality max "
          f"{max(per_mod.values()):.2e} ({max(per_mod, key=per_mod.get)})")
    assert np.isfinite(loss_g) and np.isfinite(loss_d)
    assert rel < 0.02, f"global-vs-per-device GRN loss divergence {rel:.3%}"
