"""Hub façade: MPMAE() end-to-end with a fabricated local `.pth`
(reference hubconf.py:77-93; download path is egress-blocked here, so the
``ckpt_path`` branch is exercised with a converted checkpoint file)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_mpmae_local_pth(tmp_path):
    from mmearth_tpu import hub
    from mmearth_tpu.checkpoints import torch_convert as tc
    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.models import fcmae as fcmae_lib
    from mmearth_tpu.train import optim as optim_lib

    # fabricate a pretrain checkpoint: init a flax FCMAE, export to .pth
    model = fcmae_lib.convnextv2_atto(
        img_size=56, patch_size=8, sparse=True, loss_aggr="uncertainty",
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
        dtype=jnp.float32,
    )
    batch = {
        "sentinel2": jnp.zeros((2, 56, 56, 12)),
        **{k: jnp.zeros((2, 56, 56, M.out_channels(M.OUT_MODALITIES)[k]))
           for k in ("sentinel1", "aster", "canopy_height_eth")},
        "dynamic_world": jnp.zeros((2, 56, 56, 1), jnp.int32),
        "esa_worldcover": jnp.zeros((2, 56, 56, 1), jnp.int32),
        "biome": jnp.zeros((2, 14), jnp.int32),
        "eco_region": jnp.zeros((2, 846), jnp.int32),
        "era5": jnp.zeros((2, 12)), "lat": jnp.zeros((2, 2)),
        "lon": jnp.zeros((2, 2)), "month": jnp.zeros((2, 2)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch
    )["params"]
    sd = tc.flax_fcmae_to_torch(params, (2, 2, 6, 2), M.OUT_MODALITIES)
    ckpt = tmp_path / "pt-fabricated_atto_56-8.pth"
    tc.save_pth(ckpt, sd)

    m, mp_params, trainable = hub.MPMAE(
        "convnextv2_atto", pretrained=True, linear_probe=True,
        ckpt_path=ckpt, num_classes=10, in_chans=12,
    )
    # encoder weights came from the checkpoint
    np.testing.assert_allclose(
        np.asarray(mp_params["stages_0_0"]["dwconv"]["kernel"]),
        np.asarray(params["encoder"]["stages_0_0"]["dwconv"]["kernel"]),
        rtol=1e-6,
    )
    # forward runs and probe mask freezes everything but the head
    logits = m.apply({"params": mp_params}, jnp.zeros((2, 56, 56, 12)))
    assert logits.shape == (2, 10)
    mask = optim_lib.zero_grads_mask(mp_params, trainable)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, t in flat:
        keys = jax.tree_util.keystr(path)
        assert t == ("head" in keys), keys
