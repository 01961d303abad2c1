"""Import harness for the reference's *own* torch modules, used as a golden
numerical oracle (VERDICT round 1, item 1).

The reference repo at /root/reference is a regular package (empty
``__init__.py``), but its modules import third-party packages absent from this
image (timm, kornia, MinkowskiEngine, tensorboardX, torchmetrics).  None of
those are exercised on the dense CPU path we test, so we install minimal stub
modules before importing.  The stubs implement only what the dense path
touches:

  * ``timm.models.layers.trunc_normal_`` — delegates to
    ``torch.nn.init.trunc_normal_`` (same semantics; timm's is a re-export
    plus no-grad handling).
  * ``timm.models.layers.DropPath`` — identity at drop rate 0 / eval, which is
    the only configuration the parity tests build.
  * ``kornia.augmentation.RandomCrop`` — identity transform; the tests feed
    inputs already at the crop size, where the reference crop is a no-op.
  * MinkowskiEngine / MinkowskiOps symbols — bare classes used only in
    ``isinstance`` checks inside ``FCMAE._init_weights`` on the dense path.

Nothing from the reference is copied; its modules are *imported* and executed
as a black-box oracle.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root"  # parent of the `reference` package


def _module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    import torch
    import torch.nn as nn

    # --- timm ---------------------------------------------------------
    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    timm = _module("timm")
    timm_models = _module("timm.models")
    timm_layers = _module("timm.models.layers")
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm_models.layers = timm_layers
    timm.models = timm_models
    timm_utils = _module("timm.utils")
    timm_utils.get_state_dict = lambda model, unwrap_fn=None: model.state_dict()
    timm.utils = timm_utils

    # --- kornia -------------------------------------------------------
    class RandomCrop:
        """Identity stand-in; valid because parity inputs are pre-cropped."""

        def __init__(self, size, *args, **kwargs):
            self.size = size

        def generate_parameters(self, shape):
            return {"input_shape": tuple(shape)}

        def apply_transform(self, x, params, flags=None, transform=None):
            assert x.shape[-1] == self.size[-1] and x.shape[-2] == self.size[-2], (
                "oracle RandomCrop stub requires pre-cropped inputs"
            )
            return x

    kornia = _module("kornia")
    kornia_aug = _module("kornia.augmentation")
    kornia_aug.RandomCrop = RandomCrop
    kornia.augmentation = kornia_aug

    # --- MinkowskiEngine / MinkowskiOps --------------------------------
    class _NeverInstantiated:
        def __init__(self, *a, **k):
            raise RuntimeError("Minkowski stub must not be instantiated (dense path only)")

    me = _module("MinkowskiEngine")
    for cls_name in (
        "MinkowskiConvolution",
        "MinkowskiDepthwiseConvolution",
        "MinkowskiLinear",
        "MinkowskiGELU",
        "SparseTensor",
    ):
        setattr(me, cls_name, type(cls_name, (_NeverInstantiated,), {}))
    mo = _module("MinkowskiOps")
    mo.to_sparse = _NeverInstantiated

    # --- misc ----------------------------------------------------------
    tbx = _module("tensorboardX")

    class SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def flush(self):
            pass

    tbx.SummaryWriter = SummaryWriter

    tm = _module("torchmetrics")
    tm.Dice = type("Dice", (), {})


def load_reference():
    """Returns the imported reference package modules (models + losses)."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import reference.models.convnextv2 as ref_convnextv2
    import reference.models.convnextv2_unet as ref_convnextv2_unet
    import reference.models.fcmae as ref_fcmae
    import reference.custom_loss as ref_custom_loss
    import reference.MODALITIES as ref_modalities

    return types.SimpleNamespace(
        convnextv2=ref_convnextv2,
        convnextv2_unet=ref_convnextv2_unet,
        fcmae=ref_fcmae,
        custom_loss=ref_custom_loss,
        MODALITIES=ref_modalities,
    )


def load_reference_helpers():
    """Import the reference's helpers.py (for remap_checkpoint_keys parity)."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import reference.helpers as ref_helpers

    return ref_helpers


def load_reference_optim_factory():
    """Import the reference's optim_factory.py (param groups, layer decay,
    create_optimizer) for trajectory-parity oracles.  It imports ~9
    timm.optim submodules at module scope; only torch.optim.AdamW is
    instantiated on the paths we exercise, so bare class stubs suffice."""
    install_stubs()

    class _NeverUsedOptimizer:
        def __init__(self, *a, **k):
            raise RuntimeError("timm optimizer stub must not be instantiated")

    for mod_name, cls_name in [
        ("timm.optim.adafactor", "Adafactor"),
        ("timm.optim.adahessian", "Adahessian"),
        ("timm.optim.adamp", "AdamP"),
        ("timm.optim.lookahead", "Lookahead"),
        ("timm.optim.nadam", "Nadam"),
        ("timm.optim.nvnovograd", "NvNovoGrad"),
        ("timm.optim.radam", "RAdam"),
        ("timm.optim.rmsprop_tf", "RMSpropTF"),
        ("timm.optim.sgdp", "SGDP"),
    ]:
        mod = _module(mod_name)
        setattr(mod, cls_name, type(cls_name, (_NeverUsedOptimizer,), {}))
    timm_optim = _module("timm.optim")
    sys.modules["timm"].optim = timm_optim

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import reference.optim_factory as ref_optim_factory

    return ref_optim_factory
