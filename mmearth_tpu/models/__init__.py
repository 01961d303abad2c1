from . import convnextv2, fcmae, norm  # noqa: F401

__all__ = ["convnextv2", "fcmae", "norm", "unet"]


def __getattr__(name):
    if name == "unet":
        from . import unet as _unet

        return _unet
    raise AttributeError(name)
