from flingbot_tpu.learning.nets import SpatialValueNet, MaximumValuePolicy
from flingbot_tpu.learning.transforms import (
    prepare_image,
    transform_pixels_to_source,
    preprocess_obs,
)
from flingbot_tpu.learning.memory import Memory
from flingbot_tpu.learning.dataset import GraspDataset, PrefetchLoader
from flingbot_tpu.learning.train import optimize, train_on_batch

__all__ = [
    "GraspDataset",
    "PrefetchLoader",
    "optimize",
    "train_on_batch",
    "SpatialValueNet",
    "MaximumValuePolicy",
    "prepare_image",
    "transform_pixels_to_source",
    "preprocess_obs",
    "Memory",
]
