"""Fused masked block-MLP Pallas kernel: forward and full VJP parity against
the pure-jnp reference (interpret mode; the TPU-compiled path is exercised by
the bench/verify drives)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmearth_tpu.ops import fused_block as fb


def _make(m=640, c=40, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    c4 = 4 * c
    args = dict(
        t=rng.normal(size=(m, c)).astype(np.float32),
        x_res=rng.normal(size=(m, c)).astype(np.float32),
        keep=(rng.random((m, 1)) > 0.6).astype(np.float32),
        ln_scale=rng.normal(1, 0.1, size=(c,)).astype(np.float32),
        ln_bias=rng.normal(0, 0.1, size=(c,)).astype(np.float32),
        w1=(rng.normal(size=(c, c4)) * 0.1).astype(np.float32),
        b1=rng.normal(0, 0.1, size=(c4,)).astype(np.float32),
        gamma=rng.normal(0, 0.5, size=(c4,)).astype(np.float32),
        beta=rng.normal(0, 0.1, size=(c4,)).astype(np.float32),
        w2=(rng.normal(size=(c4, c)) * 0.1).astype(np.float32),
        b2=rng.normal(0, 0.1, size=(c,)).astype(np.float32),
    )
    return {k: jnp.asarray(v, dtype if k in ("t", "x_res") else jnp.float32) for k, v in args.items()}


ORDER = ("t", "x_res", "keep", "ln_scale", "ln_bias", "w1", "b1", "gamma", "beta", "w2", "b2")


def test_forward_matches_reference():
    a = _make()
    y_k = fb.fused_block_mlp(*[a[k] for k in ORDER], True)
    y_r = fb.fused_block_mlp_reference(*[a[k] for k in ORDER])
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), rtol=2e-2, atol=2e-2)


def test_forward_nondivisible_rows():
    a = _make(m=700)  # not a multiple of the tile size -> padded path
    y_k = fb.fused_block_mlp(*[a[k] for k in ORDER], True)
    y_r = fb.fused_block_mlp_reference(*[a[k] for k in ORDER])
    assert y_k.shape == (700, 40)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("argnum,name", [(i, n) for i, n in enumerate(ORDER) if n != "keep"])
def test_vjp_matches_reference(argnum, name):
    a = _make(m=320, c=16, seed=1)
    args = [a[k] for k in ORDER]
    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.normal(size=(320, 16)).astype(np.float32))

    kfn = functools.partial(fb.fused_block_mlp, interpret=True)
    _, vjp_k = jax.vjp(lambda *xs: kfn(*xs), *args)
    _, vjp_r = jax.vjp(lambda *xs: fb.fused_block_mlp_reference(*xs), *args)
    gk = vjp_k(dy)[argnum]
    gr = vjp_r(dy)[argnum]
    scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(gk) / scale, np.asarray(gr) / scale, rtol=3e-2, atol=3e-2,
        err_msg=name,
    )


def test_masked_sites_untouched():
    """Output at masked sites must equal the residual input exactly."""
    a = _make(m=512, c=24, seed=3)
    y = fb.fused_block_mlp(*[a[k] for k in ORDER], True)
    masked = np.asarray(a["keep"])[:, 0] == 0
    np.testing.assert_array_equal(np.asarray(y)[masked], np.asarray(a["x_res"])[masked])


# ---------------------------------------------------------------------------
# spill-g variant (gathered path, all rows visible)
# ---------------------------------------------------------------------------
SG_ORDER = ("t", "x_res", "ln_scale", "ln_bias", "w1", "b1", "gamma", "beta", "w2", "b2")


def test_spillg_forward_matches_reference():
    a = _make()
    y_k = fb.fused_block_mlp_spillg(*[a[k] for k in SG_ORDER], True)
    y_r = fb.fused_block_mlp_spillg_reference(*[a[k] for k in SG_ORDER])
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), rtol=2e-2, atol=2e-2)


def test_spillg_forward_nondivisible_rows():
    # padded rows must not pollute the global GRN statistic
    a_full = _make(m=1024, seed=5)
    a_cut = {k: (v[:900] if k in ("t", "x_res") else v) for k, v in a_full.items()}
    y_k = fb.fused_block_mlp_spillg(*[a_cut[k] for k in SG_ORDER], True)
    y_r = fb.fused_block_mlp_spillg_reference(*[a_cut[k] for k in SG_ORDER])
    assert y_k.shape == (900, 40)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("argnum,name", list(enumerate(SG_ORDER)))
def test_spillg_vjp_matches_reference(argnum, name):
    a = _make(m=320, c=16, seed=1)
    args = [a[k] for k in SG_ORDER]
    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.normal(size=(320, 16)).astype(np.float32))

    kfn = functools.partial(fb.fused_block_mlp_spillg, interpret=True)
    _, vjp_k = jax.vjp(lambda *xs: kfn(*xs), *args)
    _, vjp_r = jax.vjp(lambda *xs: fb.fused_block_mlp_spillg_reference(*xs), *args)
    gk = vjp_k(dy)[argnum]
    gr = vjp_r(dy)[argnum]
    scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(gk) / scale, np.asarray(gr) / scale, rtol=3e-2, atol=3e-2,
        err_msg=name,
    )


def test_spillg_vjp_nondivisible_rows():
    a = _make(m=700, seed=7)
    args = [a[k] for k in SG_ORDER]
    rng = np.random.default_rng(8)
    dy = jnp.asarray(rng.normal(size=(700, 40)).astype(np.float32))
    kfn = functools.partial(fb.fused_block_mlp_spillg, interpret=True)
    _, vjp_k = jax.vjp(lambda *xs: kfn(*xs), *args)
    _, vjp_r = jax.vjp(lambda *xs: fb.fused_block_mlp_spillg_reference(*xs), *args)
    for i, name in enumerate(SG_ORDER):
        gk, gr = vjp_k(dy)[i], vjp_r(dy)[i]
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gk) / scale, np.asarray(gr) / scale, rtol=3e-2, atol=3e-2,
            err_msg=name,
        )


def test_spillg_matches_masked_kernel_when_all_visible():
    """With keep == 1 the two kernels compute the same function (up to the
    bf16 storage of g, which only the spill-g spec rounds; f32 here)."""
    a = _make(m=512, c=24, seed=9)
    a["keep"] = jnp.ones_like(a["keep"])
    y_m = fb.fused_block_mlp(*[a[k] for k in ORDER], True)
    y_s = fb.fused_block_mlp_spillg(*[a[k] for k in SG_ORDER], True)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_m), rtol=2e-2, atol=2e-2)
