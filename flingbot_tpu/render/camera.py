"""The flingbot camera: top-down pinhole at (0, 2, 0), fov 39.5978 deg.

The reference's pixel->world math goes through an OpenGL-style pose matrix
with two sign quirks (environment/utils.py:179-234: pose columns negated,
then world x negated again).  Composed end to end, the mapping for this
fixed top-down camera collapses to a clean closed form, which this module
implements directly — and the rasterizer uses its exact inverse, so
project(pixel_to_world(.)) round-trips by construction:

    world_x =  (col - c) * depth / f
    world_y =  camera_height - depth
    world_z = -(row - c) * depth / f

with c = S/2 and f = (S/2)/tan(fov/2) (compute_intrinsics,
environment/utils.py:205-211).  Depth is *linear* eye-space distance, the
same convention the reference gets after linearizing the GL depth buffer
(PyFlex/bindings/pyflex.cpp:1050-1054); the empty floor reads exactly
camera_height = 2.0, which is why cloth masks are `depth != 2.0`
(environment/simEnv.py:235).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CAMERA_FOV = 39.5978  # degrees (environment/utils.py:216)
CAMERA_HEIGHT = 2.0  # camera at (0, 2, 0) looking straight down


def focal_length(image_size: int, fov: float = CAMERA_FOV) -> float:
    return (image_size / 2.0) / np.tan(np.pi * fov / 180.0 / 2.0)


def project(points, image_size: int, fov: float = CAMERA_FOV,
            camera_height: float = CAMERA_HEIGHT):
    """World (..., 3) -> (row, col, depth) image coordinates (float)."""
    f = focal_length(image_size, fov)
    c = image_size / 2.0
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    depth = camera_height - y
    safe = jnp.maximum(depth, 1e-4)
    col = x * f / safe + c
    row = -z * f / safe + c
    return row, col, depth


def pixel_to_world(row, col, depth, image_size: int, fov: float = CAMERA_FOV,
                   camera_height: float = CAMERA_HEIGHT):
    """(row, col, depth) -> world (..., 3).  Matches the composition of the
    reference's pixel_to_3d + pose quirks (environment/utils.py:214-234)."""
    f = focal_length(image_size, fov)
    c = image_size / 2.0
    x = (col - c) * depth / f
    y = camera_height - depth
    z = -(row - c) * depth / f
    return jnp.stack(
        [jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)], axis=-1
    )
