from flingbot_tpu.learning.nets import SpatialValueNet, MaximumValuePolicy
from flingbot_tpu.learning.transforms import (
    prepare_image,
    transform_pixels_to_source,
    preprocess_obs,
)
from flingbot_tpu.learning.memory import Memory

__all__ = [
    "SpatialValueNet",
    "MaximumValuePolicy",
    "prepare_image",
    "transform_pixels_to_source",
    "preprocess_obs",
    "Memory",
]
