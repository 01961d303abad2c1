"""block_impl="fused" (Pallas, interpret mode on CPU) must match the composed
XLA masked block — identical param tree, forward, and gradients — so the
kernel can be swapped in on TPU without touching checkpoints or numerics."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.models.convnextv2 import Block


def test_fused_block_impl_matches_xla():
    rng = np.random.default_rng(0)
    N, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    keep = jnp.asarray((rng.random((N, H, W, 1)) > 0.5).astype(np.float32))
    x = x * keep

    bx = Block(C, sparse=True, block_impl="xla")
    bf = Block(C, sparse=True, block_impl="fused")
    params = bx.init(jax.random.PRNGKey(0), x, keep)["params"]
    # non-identity GRN (gamma/beta init to zero)
    params["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    params["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))

    # identical param trees (checkpoint compatibility)
    shapes = lambda p: jax.tree_util.tree_map(lambda a: tuple(a.shape), p)
    assert shapes(bf.init(jax.random.PRNGKey(0), x, keep)["params"]) == shapes(params)

    yx = bx.apply({"params": params}, x, keep)
    yf = bf.apply({"params": params}, x, keep)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yf), rtol=2e-5, atol=5e-5)
    # masked sites stay exactly zero through the fused path too
    np.testing.assert_array_equal(np.asarray(yf) * (1 - np.asarray(keep)), 0.0)

    def loss(mod, p):
        return (mod.apply({"params": p}, x, keep) ** 2).sum()

    gx = jax.grad(lambda p: loss(bx, p))(params)
    gf = jax.grad(lambda p: loss(bf, p))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves_with_path(gf)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_fused_auto_falls_back_off_tpu():
    """'auto' must not select the Pallas kernel on the CPU test backend, and
    grn_group forces the xla path (the kernel is global-stats only)."""
    b = Block(8, sparse=True, block_impl="auto")
    assert not b._fused_active(jnp.ones((1, 4, 4, 1)), True)
    b2 = Block(8, sparse=True, block_impl="fused", grn_group=4)
    assert not b2._fused_active(jnp.ones((1, 4, 4, 1)), True)
