"""The fused scatter->dwconv7x7->gather Pallas kernel (ops/wholeblock.py,
interpret mode on CPU) must match the XLA scatter/conv/gather composition —
op-level forward + full VJP, and in-model via block_impl="dwg" /
"wholeblock" with an identical param tree (checkpoint compatibility).
Replaces the reference's MinkowskiEngine depthwise conv hot loop
(models/convnextv2_sparse.py:47-56)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.models.convnextv2 import Block, visible_onehot
from mmearth_tpu.ops.wholeblock import (dwconv7_gathered,
                                        dwconv7_gathered_reference)


@pytest.mark.parametrize("n,grid_hw,p,c,k", [(4, 7, 8, 40, 19), (4, 7, 2, 16, 19)])
def test_dwconv7_gathered_fwd_and_vjp(n, grid_hw, p, c, k):
    rng = np.random.RandomState(0)
    L = grid_hw * grid_hw
    ids = np.stack([np.sort(rng.choice(L, k, replace=False)) for _ in range(n)])
    ids = jnp.asarray(ids.astype(np.int32))
    x = jnp.asarray(rng.randn(n, k, p, p, c), jnp.float32)
    w = jnp.asarray(rng.randn(7, 7, 1, c), jnp.float32) * 0.1
    b = jnp.asarray(rng.randn(c), jnp.float32) * 0.1

    out = dwconv7_gathered(x, ids, w, b, grid_hw, True)
    ref = dwconv7_gathered_reference(x, ids, w, b, grid_hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, interp):
        def f(x, w, b):
            args = (x, ids, w, b, grid_hw) + ((interp,) if interp is not None else ())
            return jnp.sum(jnp.sin(fn(*args)))
        return f

    g1 = jax.grad(loss(dwconv7_gathered, True), argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss(dwconv7_gathered_reference, None), argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g1, g2, ["dx", "dK", "db"]):
        a, r = np.asarray(a), np.asarray(r)
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(a / scale, r / scale, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("impl,p", [
    ("dwg", 8),          # Pallas kernel path (patch side >= 8)
    ("dwg", 2),          # onehot fallback path (p < 8 stages)
    ("wholeblock", 8),
])
def test_block_impl_matches_xla_gathered(impl, p):
    rng = np.random.default_rng(1)
    N, C = 2, 16
    grid, K = 4, 6
    h = grid * p
    mask = np.ones((N, grid * grid), np.float32)
    for i in range(N):
        mask[i, rng.permutation(grid * grid)[:K]] = 0.0
    P = visible_onehot(jnp.asarray(mask), K, jnp.float32)
    kept = jnp.asarray(np.stack([np.sort(np.where(mask[i] == 0)[0])
                                 for i in range(N)]).astype(np.int32))
    xg = jnp.asarray(rng.normal(size=(N, K, p * p, C)).astype(np.float32))
    ctx_x = (("onehot", P), grid, h)
    ctx_i = (("ids", (kept, P)), grid, h)

    bx = Block(C, sparse=True, block_impl="xla")
    bi = Block(C, sparse=True, block_impl=impl)
    params = bx.init(jax.random.PRNGKey(0), xg, None, True, ctx_x)["params"]
    params["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    params["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))

    shapes = lambda pr: jax.tree_util.tree_map(lambda a: tuple(a.shape), pr)
    assert shapes(bi.init(jax.random.PRNGKey(0), xg, None, True, ctx_i)["params"]) \
        == shapes(params)

    yx = bx.apply({"params": params}, xg, None, True, ctx_x)
    yi = bi.apply({"params": params}, xg, None, True, ctx_i)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yi),
                               rtol=2e-5, atol=5e-5)

    def loss(mod, pr, ctx):
        return (mod.apply({"params": pr}, xg, None, True, ctx) ** 2).sum()

    gx = jax.grad(lambda pr: loss(bx, pr, ctx_x))(params)
    gi = jax.grad(lambda pr: loss(bi, pr, ctx_i))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gx),
        jax.tree_util.tree_leaves_with_path(gi),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))
