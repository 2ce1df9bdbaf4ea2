from flingbot_tpu.render.camera import (
    CAMERA_FOV,
    CAMERA_HEIGHT,
    focal_length,
    project,
    pixel_to_world,
)
from flingbot_tpu.render.rasterizer import render_rgbd, render_depth

__all__ = [
    "CAMERA_FOV",
    "CAMERA_HEIGHT",
    "focal_length",
    "project",
    "pixel_to_world",
    "render_rgbd",
    "render_depth",
]
