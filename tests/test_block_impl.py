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


def test_spillg_block_impl_matches_xla_gathered():
    """block_impl="spillg" in the gathered (gather_ctx) mode must match the
    composed XLA path — identical param tree, forward, and gradients."""
    from mmearth_tpu.models.convnextv2 import visible_onehot

    rng = np.random.default_rng(1)
    N, C = 2, 16
    grid, p, K = 4, 2, 6  # 16 patches, 6 visible, (N, K, p*p, C) rows
    h = grid * p
    mask = np.ones((N, grid * grid), np.float32)
    for i in range(N):
        mask[i, rng.permutation(grid * grid)[:K]] = 0.0
    P = visible_onehot(jnp.asarray(mask), K, jnp.float32)
    xg = jnp.asarray(rng.normal(size=(N, K, p * p, C)).astype(np.float32))
    ctx = (("onehot", P), grid, h)

    bx = Block(C, sparse=True, block_impl="xla")
    bs = Block(C, sparse=True, block_impl="spillg")
    params = bx.init(jax.random.PRNGKey(0), xg, None, True, ctx)["params"]
    params["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    params["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))

    shapes = lambda pr: jax.tree_util.tree_map(lambda a: tuple(a.shape), pr)
    assert shapes(bs.init(jax.random.PRNGKey(0), xg, None, True, ctx)["params"]) == shapes(params)

    yx = bx.apply({"params": params}, xg, None, True, ctx)
    ys = bs.apply({"params": params}, xg, None, True, ctx)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(ys), rtol=2e-4, atol=5e-4)

    def loss(mod, pr):
        return (mod.apply({"params": pr}, xg, None, True, ctx) ** 2).sum()

    gx = jax.grad(lambda pr: loss(bx, pr))(params)
    gs = jax.grad(lambda pr: loss(bs, pr))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves_with_path(gs)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_remat_block_impl_matches_xla_all_modes():
    """block_impl="remat" is numerically the SAME computation under
    jax.checkpoint — forward and gradients must match the composed path to
    float tolerance, with an identical param tree, in all three block modes
    (gathered, masked-dense, plain dense)."""
    from mmearth_tpu.models.convnextv2 import visible_onehot

    rng = np.random.default_rng(2)
    N, C = 2, 16

    def check(bx, br, init_args, apply_args):
        params = bx.init(jax.random.PRNGKey(0), *init_args)["params"]
        params["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
        params["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
        shapes = lambda pr: jax.tree_util.tree_map(lambda a: tuple(a.shape), pr)
        assert shapes(br.init(jax.random.PRNGKey(0), *init_args)["params"]) == shapes(params)

        yx = bx.apply({"params": params}, *apply_args)
        yr = br.apply({"params": params}, *apply_args)
        np.testing.assert_allclose(np.asarray(yx), np.asarray(yr), rtol=1e-6, atol=1e-6)

        def loss(mod, pr):
            return (mod.apply({"params": pr}, *apply_args) ** 2).sum()

        gx = jax.grad(lambda pr: loss(bx, pr))(params)
        gr = jax.grad(lambda pr: loss(br, pr))(params)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves_with_path(gr)
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                       err_msg=jax.tree_util.keystr(path))

    # gathered (gather_ctx) mode
    grid, p, K = 4, 2, 6
    h = grid * p
    mask = np.ones((N, grid * grid), np.float32)
    for i in range(N):
        mask[i, rng.permutation(grid * grid)[:K]] = 0.0
    P = visible_onehot(jnp.asarray(mask), K, jnp.float32)
    xg = jnp.asarray(rng.normal(size=(N, K, p * p, C)).astype(np.float32))
    ctx = (("onehot", P), grid, h)
    check(Block(C, sparse=True, block_impl="xla"),
          Block(C, sparse=True, block_impl="remat"),
          (xg, None, True, ctx), (xg, None, True, ctx))

    # masked-dense mode
    H = W = 8
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
    keep = jnp.asarray((rng.random((N, H, W, 1)) > 0.5).astype(np.float32))
    xm = x * keep
    check(Block(C, sparse=True, block_impl="xla"),
          Block(C, sparse=True, block_impl="remat"),
          (xm, keep), (xm, keep))

    # plain dense (classifier/finetune) mode
    check(Block(C, sparse=False, block_impl="xla"),
          Block(C, sparse=False, block_impl="remat"),
          (x,), (x,))


def test_folded_block_impl_matches_xla_gathered():
    """block_impl="folded" (LN folded into the pw1 kernel, GRN affine folded
    into the pw2 kernel — models/convnextv2.py::_folded_tail) must match the
    composed XLA gathered path: identical param tree, forward, and gradients,
    for both global and grouped GRN statistics."""
    from mmearth_tpu.models.convnextv2 import visible_onehot

    rng = np.random.default_rng(3)
    N, C = 4, 16
    grid, p, K = 4, 2, 6
    h = grid * p
    mask = np.ones((N, grid * grid), np.float32)
    for i in range(N):
        mask[i, rng.permutation(grid * grid)[:K]] = 0.0
    P = visible_onehot(jnp.asarray(mask), K, jnp.float32)
    xg = jnp.asarray(rng.normal(size=(N, K, p * p, C)).astype(np.float32))
    ctx = (("onehot", P), grid, h)

    for group in (0, 2):
        bx = Block(C, sparse=True, block_impl="xla", grn_group=group)
        bf = Block(C, sparse=True, block_impl="folded", grn_group=group)
        params = bx.init(jax.random.PRNGKey(0), xg, None, True, ctx)["params"]
        params["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
        params["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
        shapes = lambda pr: jax.tree_util.tree_map(lambda a: tuple(a.shape), pr)
        assert shapes(bf.init(jax.random.PRNGKey(0), xg, None, True, ctx)["params"]) == shapes(params)

        yx = bx.apply({"params": params}, xg, None, True, ctx)
        yf = bf.apply({"params": params}, xg, None, True, ctx)
        np.testing.assert_allclose(np.asarray(yx), np.asarray(yf), rtol=1e-4, atol=1e-5)

        gx = jax.grad(lambda pr: (bx.apply({"params": pr}, xg, None, True, ctx) ** 2).sum())(params)
        gf = jax.grad(lambda pr: (bf.apply({"params": pr}, xg, None, True, ctx) ** 2).sum())(params)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves_with_path(gf)
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                       err_msg=f"group={group} {jax.tree_util.keystr(path)}")
