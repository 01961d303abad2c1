"""Hub entry point (reference hubconf.py API parity).

    from hubconf import MPMAE
    model, params, trainable = MPMAE("convnextv2_atto",
                                     "all_mod_atto_1M_64_uncertainty_56-8",
                                     ckpt_path="pt-....pth", num_classes=10)
"""
from mmearth_tpu.hub import CKPT_URLS, MPMAE, dependencies  # noqa: F401
