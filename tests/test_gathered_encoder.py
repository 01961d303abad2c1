"""The gathered sparse encoder (compute on visible patches only — the true
MinkowskiEngine equivalent) must be numerically identical to the proven
masked-dense path, forward and backward, at both reference geometries."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.models import convnextv2 as cnx
from mmearth_tpu.models import fcmae as fcmae_lib
from mmearth_tpu.models.convnextv2 import (
    gather_visible, scatter_visible, visible_ids, visible_onehot,
)


def test_gather_scatter_roundtrip():
    rng = np.random.default_rng(0)
    n, grid, p, c = 3, 7, 4, 5
    x = jnp.asarray(rng.normal(size=(n, grid * p, grid * p, c)).astype(np.float32))
    mask = fcmae_lib.gen_random_mask(jax.random.PRNGKey(0), n, grid * grid, 0.6)
    k = int(grid * grid * 0.4)
    kept, inv = visible_ids(mask, k)
    assert kept.shape == (n, k)
    # kept ids are exactly the zero entries of the mask, ascending
    for i in range(n):
        expect = np.nonzero(1 - np.asarray(mask)[i])[0]
        np.testing.assert_array_equal(np.sort(np.asarray(kept)[i]), expect)

    P = visible_onehot(mask, k, jnp.float32)
    xg = gather_visible(x, P, grid)
    assert xg.shape == (n, k, p * p, c)
    dense = scatter_visible(xg, P, grid, grid * p)
    # visible patches round-trip exactly; removed patches are zero
    keep_pix = cnx.upsample_mask(1.0 - mask.astype(jnp.float32), grid, grid * p)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(x * keep_pix))


@pytest.mark.parametrize("img_size,patch_size", [(56, 8), (112, 16)])
def test_gathered_matches_masked_dense(img_size, patch_size):
    rng = np.random.default_rng(1)
    n, c_in = 2, 12
    grid = img_size // patch_size
    num_visible = int(grid * grid * 0.4)
    x = jnp.asarray(rng.normal(size=(n, img_size, img_size, c_in)).astype(np.float32))
    mask = fcmae_lib.gen_random_mask(jax.random.PRNGKey(3), n, grid * grid, 0.6)

    kw = dict(img_size=img_size, patch_size=patch_size, in_chans=c_in,
              num_classes=10, depths=(1, 1, 2, 1), dims=(16, 32, 64, 128), sparse=True)
    m_dense = cnx.ConvNeXtV2(**kw, sparse_impl="masked_dense")
    m_gath = cnx.ConvNeXtV2(**kw, sparse_impl="gathered")
    params = m_dense.init(jax.random.PRNGKey(0), x, mask)["params"]

    # non-identity GRN affines
    def randomize(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        if "grn" in keys:
            seed = abs(hash("/".join(keys))) % (2 ** 31)
            return jnp.asarray(np.random.default_rng(seed).normal(size=leaf.shape).astype(np.float32))
        return leaf
    params = jax.tree_util.tree_map_with_path(randomize, params)

    def run(m, p, nv):
        return m.apply({"params": p}, x, mask, method=lambda mod, a, b: mod.encode(a, b, num_visible=nv))

    y_dense = run(m_dense, params, None)
    y_gath = run(m_gath, params, num_visible)
    assert y_gath.shape == y_dense.shape
    # identical math; tolerance covers reduction-order float noise (GRN
    # statistics sum the same visible terms in a different order)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_gath), rtol=2e-3, atol=2e-3)

    # gradients agree too
    def loss(m, p, nv):
        return (run(m, p, nv) ** 2).sum()

    g_dense = jax.grad(lambda p: loss(m_dense, p, None))(params)
    g_gath = jax.grad(lambda p: loss(m_gath, p, num_visible))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_dense), jax.tree_util.tree_leaves_with_path(g_gath)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_fcmae_loss_identical_across_impls():
    """Full FCMAE forward+loss: gathered vs masked_dense encoders give the
    same loss with the same rngs (mini model, 2 modalities)."""
    from mmearth_tpu.configs import modalities as M

    def build(impl):
        return fcmae_lib.FCMAE(
            img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
            decoder_depth=1, decoder_embed_dim=32, sparse=True, sparse_impl=impl,
            loss_aggr="uncertainty", inp_modalities=M.INP_MODALITIES,
            out_modalities={"sentinel2": M.OUT_MODALITIES["sentinel2"],
                            "biome": M.OUT_MODALITIES["biome"]},
            dtype=jnp.float32,
        )

    rng = np.random.default_rng(2)
    batch = {
        "sentinel2": jnp.asarray(rng.normal(size=(2, 32, 32, 12)).astype(np.float32)),
        "biome": jnp.asarray(np.eye(14, dtype=np.int32)[rng.integers(0, 14, 2)]),
    }
    m_d = build("masked_dense")
    m_g = build("gathered")
    variables = m_d.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch)
    loss_d, *_ = m_d.apply(variables, batch, rngs={"mask": jax.random.PRNGKey(5)})
    loss_g, *_ = m_g.apply(variables, batch, rngs={"mask": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(float(loss_d), float(loss_g), rtol=1e-5)


@pytest.mark.parametrize("use_orig_stem", [False, True])
def test_stem_gathered_matches_dense_stem(use_orig_stem):
    """stem_gathered=True (stem tail on visible rows) equals the dense stem."""
    rng = np.random.default_rng(4)
    n, c_in, img, patch = 2, 5, 56, 8
    grid = img // patch
    num_visible = int(grid * grid * 0.4)
    x = jnp.asarray(rng.normal(size=(n, img, img, c_in)).astype(np.float32))
    mask = fcmae_lib.gen_random_mask(jax.random.PRNGKey(5), n, grid * grid, 0.6)

    kw = dict(img_size=img, patch_size=patch, in_chans=c_in, num_classes=3,
              depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), sparse=True,
              sparse_impl="gathered", use_orig_stem=use_orig_stem)
    m0 = cnx.ConvNeXtV2(**kw, stem_gathered=False)
    m1 = cnx.ConvNeXtV2(**kw, stem_gathered=True)
    params = m0.init(jax.random.PRNGKey(0), x, mask)["params"]

    def run(m):
        return m.apply({"params": params}, x, mask,
                       method=lambda mod, a, b: mod.encode(a, b, num_visible=num_visible))

    y0, y1 = run(m0), run(m1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-5)
