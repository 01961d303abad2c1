"""torch <-> flax checkpoint conversion: round-trips, Minkowski kernel remap,
and numerical load-equivalence through the model."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.checkpoints import torch_convert as tc
from mmearth_tpu.configs import modalities as M
from mmearth_tpu.models import convnextv2 as cnx
from mmearth_tpu.models import fcmae


def tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + str(k))


def test_encoder_roundtrip():
    model = cnx.convnextv2_atto(img_size=56, patch_size=8, in_chans=12, num_classes=10)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 12)))["params"]
    sd = tc.flax_encoder_to_torch(params, depths=(2, 2, 6, 2))
    back = tc.torch_encoder_to_flax(sd, depths=(2, 2, 6, 2))
    tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


def test_fcmae_roundtrip():
    model = fcmae.convnextv2_atto(
        img_size=56, patch_size=8, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sentinel2": jnp.array(rng.normal(size=(1, 56, 56, 12)).astype(np.float32)),
        "sentinel1": jnp.array(rng.normal(size=(1, 56, 56, 8)).astype(np.float32)),
        "aster": jnp.array(rng.normal(size=(1, 56, 56, 2)).astype(np.float32)),
        "canopy_height_eth": jnp.array(rng.normal(size=(1, 56, 56, 2)).astype(np.float32)),
        "dynamic_world": jnp.array(rng.integers(0, 9, size=(1, 56, 56, 1)).astype(np.int64)),
        "esa_worldcover": jnp.array(rng.integers(0, 11, size=(1, 56, 56, 1)).astype(np.int64)),
        "era5": jnp.array(rng.normal(size=(1, 12)).astype(np.float32)),
        "lat": jnp.array(rng.normal(size=(1, 2)).astype(np.float32)),
        "lon": jnp.array(rng.normal(size=(1, 2)).astype(np.float32)),
        "month": jnp.array(rng.normal(size=(1, 2)).astype(np.float32)),
        "biome": jnp.array(np.eye(14, dtype=np.int64)[[3]]),
        "eco_region": jnp.array(np.eye(846, dtype=np.int64)[[5]]),
    }
    params = model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch)["params"]
    sd = tc.flax_fcmae_to_torch(params, (2, 2, 6, 2), M.OUT_MODALITIES)
    # shared decoder appears under every modality name, same tensors
    assert "decoder_dict.sentinel2.0.dwconv.weight" in sd
    assert "decoder_dict.esa_worldcover.0.dwconv.weight" in sd
    np.testing.assert_array_equal(
        sd["decoder_dict.sentinel2.0.dwconv.weight"],
        sd["decoder_dict.esa_worldcover.0.dwconv.weight"],
    )
    back = tc.torch_fcmae_to_flax(sd, (2, 2, 6, 2), M.OUT_MODALITIES)
    tree_equal(jax.tree_util.tree_map(np.asarray, params), back)

    # loading the converted tree reproduces the forward bit-for-bit
    loss1, *_ = model.apply({"params": params}, batch, rngs={"mask": jax.random.PRNGKey(7)})
    loss2, *_ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, back)}, batch, rngs={"mask": jax.random.PRNGKey(7)}
    )
    assert float(loss1) == float(loss2)


def test_minkowski_kernel_remap():
    """remap_minkowski_keys inverts the Minkowski kernel layout the same way
    helpers.remap_checkpoint_keys does (helpers.py:668-707)."""
    rng = np.random.default_rng(1)
    # standard conv kernel (K^2, in, out), K=2 downsample conv
    out_dim, in_dim, ks = 80, 40, 2
    dense = rng.normal(size=(out_dim, in_dim, ks, ks)).astype(np.float32)
    # inverse of the reference transform: OIHW -> (K^2, in, out)
    mink = dense.swapaxes(3, 2).reshape(out_dim, in_dim, ks * ks).transpose(2, 1, 0)
    sd = {"encoder.downsample_layers.0.1.kernel": mink, "encoder.downsample_layers.0.1.bias": rng.normal(size=(out_dim, 1)).astype(np.float32)}
    out = tc.remap_minkowski_keys(sd)
    np.testing.assert_allclose(out["downsample_layers.0.1.weight"], dense)
    assert out["downsample_layers.0.1.bias"].shape == (out_dim,)

    # depthwise kernel (K^2, C), K=7 block dwconv
    c, ks = 40, 7
    dense_dw = rng.normal(size=(c, 1, ks, ks)).astype(np.float32)
    mink_dw = dense_dw.swapaxes(3, 2).reshape(c, ks * ks).transpose(1, 0)
    out = tc.remap_minkowski_keys({"encoder.stages.0.0.dwconv.kernel": mink_dw})
    np.testing.assert_allclose(out["stages.0.0.dwconv.weight"], dense_dw)


def test_minkowski_path_collapse_and_grn():
    rng = np.random.default_rng(2)
    sd = {
        "encoder.stages.0.0.norm.ln.weight": rng.normal(size=(40,)).astype(np.float32),
        "encoder.stages.0.0.pwconv1.linear.weight": rng.normal(size=(160, 40)).astype(np.float32),
        "encoder.stages.0.0.pwconv1.linear.bias": rng.normal(size=(160,)).astype(np.float32),
        "encoder.stages.0.0.grn.gamma": rng.normal(size=(1, 160)).astype(np.float32),
    }
    out = tc.remap_minkowski_keys(sd)
    assert "stages.0.0.norm.weight" in out
    assert "stages.0.0.pwconv1.weight" in out
    assert out["stages.0.0.grn.gamma"].shape == (1, 1, 1, 160)


def test_raw_minkowski_fcmae_import():
    """A raw sparse-format pretrain checkpoint (Minkowski kernels) imports into
    the FCMAE tree with the right shapes."""
    model = fcmae.convnextv2_atto(
        img_size=56, patch_size=8, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
    )
    depths, dims = (2, 2, 6, 2), (40, 80, 160, 320)
    # build a flax tree, export to dense torch, then fabricate the Minkowski
    # layout by inverting the remap on conv kernels
    rng = np.random.default_rng(3)
    batch_s2 = jnp.zeros((1, 56, 56, 12))
    batch = {"sentinel2": batch_s2, "biome": jnp.array(np.eye(14, dtype=np.int64)[[0]])}
    out_mods = {"sentinel2": M.OUT_MODALITIES["sentinel2"], "biome": "all"}
    model_small = fcmae.convnextv2_atto(
        img_size=56, patch_size=8, sparse=True, loss_aggr="unweighted",
        inp_modalities=M.INP_MODALITIES, out_modalities=out_mods,
    )
    params = model_small.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch)["params"]
    sd = tc.flax_fcmae_to_torch(params, depths, out_mods)

    mink_sd = {}
    for k, v in sd.items():
        if not k.startswith("encoder."):
            mink_sd[k] = v
            continue
        if k.endswith(".weight") and v.ndim == 4 and ("dwconv" in k or "stem.0" in k):
            c = v.shape[0]
            ks = v.shape[-1]
            mink_sd[k[:-7] + ".kernel"] = v.swapaxes(3, 2).reshape(c, ks * ks).transpose(1, 0)
        elif k.endswith(".weight") and v.ndim == 4:
            o, i, ks, _ = v.shape
            mink_sd[k[:-7] + ".kernel"] = v.swapaxes(3, 2).reshape(o, i, ks * ks).transpose(2, 1, 0)
        else:
            mink_sd[k] = v

    back = tc.torch_fcmae_to_flax(mink_sd, depths, out_mods)
    ref = jax.tree_util.tree_map(np.asarray, params)

    def cmp(a, b, path=""):
        for kk in a:
            if isinstance(a[kk], dict):
                cmp(a[kk], b[kk], path + "/" + kk)
            else:
                np.testing.assert_allclose(a[kk], b[kk], err_msg=path + "/" + kk, atol=0)

    cmp(ref["encoder"], back["encoder"])


def test_pth_file_roundtrip(tmp_path):
    """Exported .pth is a real torch-loadable file and round-trips."""
    from mmearth_tpu.checkpoints.torch_convert import load_pth, save_pth

    model = cnx.convnextv2_atto(img_size=56, patch_size=8, in_chans=12, num_classes=10)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 12)))["params"]
    sd = tc.flax_encoder_to_torch(params, depths=(2, 2, 6, 2))
    path = tmp_path / "export.pth"
    save_pth(path, sd)

    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert "model" in raw and set(raw["model"]) == set(sd)

    back = load_pth(path)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
    tree = tc.torch_encoder_to_flax(back, depths=(2, 2, 6, 2))
    tree_equal(jax.tree_util.tree_map(np.asarray, params), tree)
