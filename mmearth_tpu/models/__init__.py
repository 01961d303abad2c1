from . import convnextv2, fcmae, norm, unet  # noqa: F401

__all__ = ["convnextv2", "fcmae", "norm", "unet"]
