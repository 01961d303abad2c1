from . import modalities
from .config import (
    DataConfig,
    FinetuneConfig,
    ModelConfig,
    MODEL_SIZES,
    model_size,
    OptimConfig,
    PretrainConfig,
    RunConfig,
)

__all__ = [
    "modalities",
    "DataConfig",
    "FinetuneConfig",
    "ModelConfig",
    "MODEL_SIZES",
    "model_size",
    "OptimConfig",
    "PretrainConfig",
    "RunConfig",
]
