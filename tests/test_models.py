"""Model numerics: torch-parity for the norm layers and ConvNeXtV2 block, and
the sparse-equivalence invariants of the masked encoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mmearth_tpu.models import convnextv2 as cnx
from mmearth_tpu.models.norm import GRN, LayerNorm, MaskedGRN


def torch_layernorm(x_np, w, b, eps=1e-6):
    x = torch.from_numpy(x_np)
    return torch.nn.functional.layer_norm(
        x, (x_np.shape[-1],), torch.from_numpy(w), torch.from_numpy(b), eps
    ).numpy()


def torch_grn_dense(x_np, gamma, beta):
    # reference models/norm_layers.py:33-44 (input NHWC)
    x = torch.from_numpy(x_np)
    gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-4)
    g = torch.from_numpy(gamma).reshape(1, 1, 1, -1)
    b = torch.from_numpy(beta).reshape(1, 1, 1, -1)
    return (g * (x * nx) + b + x).numpy()


def torch_grn_sparse(feats_np, gamma, beta):
    # reference models/sparse_norm_layers.py:24-33 on the active-site matrix
    f = torch.from_numpy(feats_np)
    gx = torch.norm(f, p=2, dim=0, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    g = torch.from_numpy(gamma).reshape(1, -1)
    b = torch.from_numpy(beta).reshape(1, -1)
    return (g * (f * nx) + b + f).numpy()


def test_layernorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    mod = LayerNorm(8)
    out = mod.apply({"params": {"scale": jnp.array(w), "bias": jnp.array(b)}}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), torch_layernorm(x, w, b), rtol=1e-5, atol=1e-5)


def test_grn_dense_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    g = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    mod = GRN(8)
    out = mod.apply({"params": {"gamma": jnp.array(g), "beta": jnp.array(b)}}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), torch_grn_dense(x, g, b), rtol=1e-5, atol=1e-5)


def test_masked_grn_matches_minkowski_semantics():
    """MaskedGRN over a masked dense map == MinkowskiGRN over the active-site
    feature matrix."""
    rng = np.random.default_rng(2)
    n, h, w, c = 3, 4, 4, 8
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    keep = (rng.random((n, h, w, 1)) > 0.5).astype(np.float32)
    x = x * keep  # dense map with zeros at masked sites
    g = rng.normal(size=(c,)).astype(np.float32)
    b = rng.normal(size=(c,)).astype(np.float32)

    mod = MaskedGRN(c)
    out = mod.apply(
        {"params": {"gamma": jnp.array(g), "beta": jnp.array(b)}}, jnp.array(x), jnp.array(keep)
    )
    out = np.asarray(out) * keep  # caller re-masks at block end

    active = keep[..., 0] > 0
    feats = x[active]  # (num_active, C) — sparse feature matrix
    golden = torch_grn_sparse(feats, g, b)
    np.testing.assert_allclose(out[active], golden, rtol=1e-5, atol=1e-5)


def torch_block(dim):
    """Reference ConvNeXtV2 Block in torch (convnextv2.py:18-55), NCHW."""

    class TBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = torch.nn.Linear(dim, 4 * dim)
            self.grn_g = torch.nn.Parameter(torch.zeros(1, 1, 1, 4 * dim))
            self.grn_b = torch.nn.Parameter(torch.zeros(1, 1, 1, 4 * dim))
            self.pwconv2 = torch.nn.Linear(4 * dim, dim)

        def forward(self, x):
            inp = x
            x = self.dwconv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.pwconv1(x)
            x = torch.nn.functional.gelu(x)
            gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
            nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-4)
            x = self.grn_g * (x * nx) + self.grn_b + x
            x = self.pwconv2(x)
            x = x.permute(0, 3, 1, 2)
            return inp + x

    return TBlock()


def test_block_matches_torch():
    dim = 16
    tb = torch_block(dim)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 10, 10, dim)).astype(np.float32)

    blk = cnx.Block(dim, sparse=False)
    params = blk.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    # copy torch weights into the flax tree
    p = jax.tree_util.tree_map(np.asarray, params)
    with torch.no_grad():
        p["dwconv"]["kernel"] = tb.dwconv.weight.numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        p["dwconv"]["bias"] = tb.dwconv.bias.numpy()
        p["norm"]["scale"] = tb.norm.weight.numpy()
        p["norm"]["bias"] = tb.norm.bias.numpy()
        p["pwconv1"]["kernel"] = tb.pwconv1.weight.numpy().T
        p["pwconv1"]["bias"] = tb.pwconv1.bias.numpy()
        p["grn"]["gamma"] = tb.grn_g.numpy().reshape(-1)
        p["grn"]["beta"] = tb.grn_b.numpy().reshape(-1)
        p["pwconv2"]["kernel"] = tb.pwconv2.weight.numpy().T
        p["pwconv2"]["bias"] = tb.pwconv2.bias.numpy()
        golden = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    out = blk.apply({"params": p}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("img_size,patch_size", [(56, 8), (112, 16)])
def test_masked_encoder_sparse_invariants(img_size, patch_size):
    """The sparse-equivalent encoder must (a) zero masked sites exactly, and
    (b) be invariant to the content of masked input regions — the two defining
    properties of the MinkowskiEngine sparse path."""
    model = cnx.convnextv2_atto(
        img_size=img_size, patch_size=patch_size, in_chans=12, sparse=True
    )
    n = 2
    grid = img_size // patch_size
    L = grid * grid
    rng = np.random.default_rng(4)
    x = rng.normal(size=(n, img_size, img_size, 12)).astype(np.float32)
    mask = (rng.random((n, L)) < 0.6).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.array(x), mask=jnp.array(mask))["params"]
    out = model.apply({"params": params}, jnp.array(x), mask=jnp.array(mask))
    out = np.asarray(out)
    assert out.shape == (n, grid, grid, 320)

    # (a) masked sites exactly zero (== .dense() of the sparse tensor)
    m_grid = mask.reshape(n, grid, grid)
    assert np.all(out[m_grid == 1] == 0.0)

    # (b) visible outputs independent of masked-region content
    x2 = x.copy()
    keep_pix = 1.0 - np.repeat(np.repeat(m_grid, patch_size, 1), patch_size, 2)
    x2 += 1000.0 * (1.0 - keep_pix)[..., None] * rng.normal(size=x.shape)
    out2 = np.asarray(model.apply({"params": params}, jnp.array(x2), mask=jnp.array(mask)))
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-5)


def test_classifier_forward_shapes():
    model = cnx.convnextv2_atto(img_size=56, patch_size=8, in_chans=12, num_classes=10)
    x = jnp.zeros((2, 56, 56, 12))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 10)


def test_grn_dead_channel_gradient_is_finite():
    """A channel whose activations are all exactly zero (dead channel: gelu
    underflows to 0 once pre-activations drop below ~-15) must not produce a
    non-finite gradient through the GRN L2 statistic (d sqrt(0) = inf; torch
    has the same hazard and the reference would sys.exit on it).  The forward
    value must be unchanged by the safe-sqrt."""
    rng = np.random.default_rng(7)
    n, h, w, c = 2, 4, 4, 8
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    x[..., 3] = 0.0  # dead channel
    xj = jnp.asarray(x)

    for mod, args in (
        (GRN(c), (xj,)),
        (MaskedGRN(c), (xj, jnp.ones((n, h, w, 1)))),
    ):
        params = mod.init(jax.random.PRNGKey(0), *args)["params"]
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32)), params)

        y = mod.apply({"params": params}, *args)
        assert np.all(np.isfinite(np.asarray(y)))
        # forward: dead channel passes through as gamma*0*nx + beta + 0 = beta
        np.testing.assert_allclose(
            np.asarray(y)[..., 3], float(params["beta"][3]), rtol=1e-6)

        def loss(p):
            return (mod.apply({"params": p}, *args) ** 2).sum()

        g_p = jax.grad(loss)(params)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
            assert np.all(np.isfinite(np.asarray(leaf))), jax.tree_util.keystr(path)
        g_x = jax.grad(lambda a: (mod.apply({"params": params}, a, *args[1:]) ** 2).sum())(xj)
        assert np.all(np.isfinite(np.asarray(g_x)))
