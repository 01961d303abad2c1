"""Analytic jaxpr FLOP counter: known-shape dot/conv/scan cases."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.utils.flops import step_flops


def test_dot_flops():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert step_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 32 * 16


def test_batched_dot_flops():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    f = lambda x, y: jax.lax.dot_general(x, y, (((2,), (1,)), ((0,), (0,))))
    assert step_flops(f, a, b) == 2 * 4 * 8 * 32 * 16


def test_conv_flops():
    x = jnp.zeros((2, 8, 8, 12))
    w = jnp.zeros((3, 3, 12, 24))
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert step_flops(f, x, w) == 2 * (2 * 8 * 8 * 24) * 3 * 3 * 12


def test_depthwise_conv_flops():
    x = jnp.zeros((2, 8, 8, 12))
    w = jnp.zeros((3, 3, 1, 12))
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=12)
    assert step_flops(f, x, w) == 2 * (2 * 8 * 8 * 12) * 3 * 3 * 1


def test_grad_counts_backward():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    fwd = step_flops(lambda x, y: (x @ y).sum(), a, b)
    both = step_flops(jax.grad(lambda x, y: (x @ y).sum(), argnums=(0, 1)), a, b)
    # backward of a matmul = two matmuls of the same FLOP count
    assert both == 3 * fwd


def test_scan_multiplies():
    a = jnp.zeros((8, 8))

    def f(x):
        def body(c, _):
            return c @ a, None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    assert step_flops(f, a) == 5 * 2 * 8 * 8 * 8
