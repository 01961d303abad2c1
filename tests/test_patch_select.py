"""patch_select gather/scatter: equivalence with the one-hot selection path.

On CPU these exercise the jnp fallback; the pallas kernels themselves are
validated on TPU by the same comparisons (see ops/patch_select.py docstring
for the measured perf result).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.models import convnextv2 as cn
from mmearth_tpu.ops import patch_select as ps


@pytest.fixture(scope="module")
def setup():
    N, GRID, K = 4, 7, 19
    key = jax.random.PRNGKey(0)
    order = jax.random.uniform(key, (N, GRID * GRID)).argsort(1)
    mask = (order >= K).astype(jnp.float32)
    kept_ids, _ = cn.visible_ids(mask, K)
    P = cn.visible_onehot(mask, K, jnp.float32)
    return N, GRID, K, mask, kept_ids, P


@pytest.mark.parametrize("h,c", [(56, 8), (28, 16), (14, 32), (7, 24)])
def test_gather_scatter_match_onehot(setup, h, c):
    N, GRID, K, mask, kept_ids, P = setup
    p = h // GRID
    x = jax.random.normal(jax.random.PRNGKey(h), (N, h, h, c), jnp.float32)

    got = ps.gather_patches(x, kept_ids, p, GRID)
    ref = cn.gather_visible(x, P, GRID)
    np.testing.assert_allclose(np.asarray(got).reshape(ref.shape), np.asarray(ref))

    ds = ps.scatter_patches(got, kept_ids, p, GRID, h)
    rs = cn.scatter_visible(ref, P, GRID, h)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(rs))


def test_adjoint_property(setup):
    """<gather(x), y> == <x, scatter(y)> — the VJP pair is exact."""
    N, GRID, K, mask, kept_ids, P = setup
    h, c = 14, 8
    p = h // GRID
    kx, ky = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (N, h, h, c))
    y = jax.random.normal(ky, (N, K, p, p, c))
    lhs = jnp.vdot(ps.gather_patches(x, kept_ids, p, GRID), y)
    rhs = jnp.vdot(x, ps.scatter_patches(y, kept_ids, p, GRID, h))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_grads_match_onehot(setup):
    N, GRID, K, mask, kept_ids, P = setup
    h, c = 28, 8
    p = h // GRID
    x = jax.random.normal(jax.random.PRNGKey(2), (N, h, h, c))

    def f_ps(x):
        g = ps.gather_patches(x, kept_ids, p, GRID)
        return (ps.scatter_patches(g * 2.0, kept_ids, p, GRID, h) ** 2).sum()

    def f_oh(x):
        g = cn.gather_visible(x, P, GRID)
        return (cn.scatter_visible(g * 2.0, P, GRID, h) ** 2).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_ps)(x)), np.asarray(jax.grad(f_oh)(x)), rtol=1e-5
    )


def test_model_gather_impl_equivalence():
    """ConvNeXtV2 encode: gather_impl='pallas' (jnp fallback on CPU) equals
    'onehot' bit-for-bit in f32."""
    model_kw = dict(
        patch_size=8, img_size=56, in_chans=3, num_classes=0,
        depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), sparse=True,
        sparse_impl="gathered",
    )
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 56, 56, 3))
    L = (56 // 8) ** 2
    order = jax.random.uniform(jax.random.fold_in(key, 1), (2, L)).argsort(1)
    K = int(L * 0.4)
    mask = (order >= K).astype(jnp.float32)

    m1 = cn.ConvNeXtV2(gather_impl="onehot", **model_kw)
    m2 = cn.ConvNeXtV2(gather_impl="pallas", **model_kw)
    params = m1.init({"params": key}, x, mask)["params"]
    y1 = m1.apply({"params": params}, x, mask=mask, method=lambda m, x, mask: m.encode(x, mask, num_visible=K))
    y2 = m2.apply({"params": params}, x, mask=mask, method=lambda m, x, mask: m.encode(x, mask, num_visible=K))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_dot6_selection_bit_exact():
    """gather_impl="dot6" (gather_visible6/scatter_visible6: one dot_general
    over the free 6-D view, transpose absorbed into the contraction) must be
    bit-exact vs the onehot selection matmuls at the flagship geometry."""
    import numpy as np
    import jax.numpy as jnp

    from mmearth_tpu.models.convnextv2 import (
        gather_visible, gather_visible6, scatter_visible, scatter_visible6,
        visible_onehot)

    rng = np.random.default_rng(2)
    N, grid, p, C, K = 3, 7, 8, 12, 19
    h = grid * p
    mask = np.ones((N, grid * grid), np.float32)
    for i in range(N):
        mask[i, rng.permutation(grid * grid)[:K]] = 0.0
    P = visible_onehot(jnp.asarray(mask), K, jnp.float32)
    x = jnp.asarray(rng.normal(size=(N, h, h, C)).astype(np.float32))
    g1 = gather_visible(x, P, grid)
    g2 = gather_visible6(x, P, grid)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    s1 = scatter_visible(g1, P, grid, h)
    s2 = scatter_visible6(g1, P, grid, h)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
