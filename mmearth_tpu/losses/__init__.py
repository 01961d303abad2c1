from .finetune import (  # noqa: F401
    criterion_fn,
    dice_loss,
    segmentation_cross_entropy,
    smoothed_binary_cross_entropy,
    smoothed_cross_entropy,
)
from .multipretext import (  # noqa: F401
    cross_entropy,
    image_categorical_loss,
    image_continuous_loss,
    multipretext_loss,
    patchify,
    pixel_categorical_loss,
    pixel_continuous_loss,
    uncertainty_weighted,
    unpatchify,
    unweighted,
)
