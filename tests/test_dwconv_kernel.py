"""ops/dwconv.py — the Pallas depthwise weight-grad kernel (interpret mode).

The kernel measured SLOWER than XLA's conv backward at every stage shape on
v5e (ROADMAP.md "Performance" #1), so nothing selects it in the model; these
tests keep its correctness pinned while it exists as a documented negative
result / starting point.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.ops import dwconv as dwk


@pytest.mark.parametrize("n,h,c", [(4, 14, 16), (3, 8, 40)])
def test_weight_grad_matches_reference(n, h, c):
    kx, kd = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, h, c), jnp.float32)
    dy = jax.random.normal(kd, (n, h, h, c), jnp.float32)
    got = dwk.dw_weight_grad(x, dy, interpret=True)
    want = dwk.dw_weight_grad_reference(x, dy)
    # accumulation order differs (per-tap VMEM scratch vs stacked jnp sums)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3)


def test_dwconv7x7_grads_match_xla():
    n, h, c = 2, 10, 12
    kx, kw, kb, kd = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(kx, (n, h, h, c), jnp.float32)
    w = jax.random.normal(kw, (7, 7, 1, c), jnp.float32) * 0.1
    b = jax.random.normal(kb, (c,), jnp.float32) * 0.1
    dy = jax.random.normal(kd, (n, h, h, c), jnp.float32)

    def loss_pallas(x, w, b):
        return jnp.vdot(dwk.dwconv7x7(x, w, b, True), dy)

    def loss_xla(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.vdot(y, dy)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, bq in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bq), rtol=1e-4, atol=1e-4)
