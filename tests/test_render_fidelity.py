"""Splat-renderer image fidelity vs a dense ground-truth surface
rasterization (VERDICT r4 item 9).

The production renderer z-buffers particle DISK SPLATS
(render/rasterizer.py); the reference rasterizes cloth TRIANGLES
(PyFlex/bindings/opengl/shadersGL.cpp:3253-3330, Blender path
environment/utils.py:59-128).  Pick-point validity flows through the
cloth mask (simEnv.py:235-253), so the splat mask must agree with what a
triangle rasterizer would produce.  Ground truth here: every grid quad
bilinearly super-sampled into a dense point cloud (~8x8 samples/cell —
finer than a pixel at 720^2), projected with the same camera.  Mask IoU
must be >= 0.95 on reference-style scenes (flat / crumpled / mid-fling),
and floor pixels must read exactly camera_height=2.0
(pyflex.cpp:1039-1054 linearized-depth convention)."""

import h5py
import numpy as np
import pytest
import jax.numpy as jnp

from flingbot_tpu.engine.topology import grid_positions, grid_triangles_np
from flingbot_tpu.render.camera import CAMERA_HEIGHT, focal_length
from flingbot_tpu.render.rasterizer import render_depth

S = 720


def dense_surface_mask(grid_pts, image_size, samples=8):
    """(dimy, dimx, 3) grid -> bool (S, S) mask by bilinear quad
    super-sampling (the dense stand-in for triangle rasterization)."""
    g = np.asarray(grid_pts, np.float64)
    p00 = g[:-1, :-1][..., None, None, :]
    p01 = g[:-1, 1:][..., None, None, :]
    p10 = g[1:, :-1][..., None, None, :]
    p11 = g[1:, 1:][..., None, None, :]
    t = (np.arange(samples) + 0.5) / samples
    u = t[:, None, None]
    v = t[None, :, None]
    pts = ((1 - u) * (1 - v) * p00 + (1 - u) * v * p01
           + u * (1 - v) * p10 + u * v * p11)  # (Y-1, X-1, s, s, 3)
    pts = pts.reshape(-1, 3)
    f = focal_length(image_size)
    c = image_size / 2.0
    depth = np.maximum(CAMERA_HEIGHT - pts[:, 1], 1e-4)
    col = np.round(pts[:, 0] * f / depth + c).astype(int)
    row = np.round(-pts[:, 2] * f / depth + c).astype(int)
    ok = (row >= 0) & (row < image_size) & (col >= 0) & (col < image_size)
    mask = np.zeros((image_size, image_size), bool)
    mask[row[ok], col[ok]] = True
    return mask


def splat_mask(grid_pts, image_size):
    dimy, dimx = grid_pts.shape[:2]
    pts = jnp.asarray(np.asarray(grid_pts, np.float32).reshape(-1, 3))
    active = jnp.ones(pts.shape[0], bool)
    faces = jnp.asarray(grid_triangles_np(dimx, dimy))
    tri_mask = jnp.ones(faces.shape[0], bool)
    depth = np.asarray(render_depth(
        pts, active, image_size=image_size, faces=faces, tri_mask=tri_mask))
    return depth < CAMERA_HEIGHT - 1e-4, depth


def iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def check_scene(grid_pts, min_iou=0.95):
    gt = dense_surface_mask(grid_pts, S)
    got, depth = splat_mask(grid_pts, S)
    # floor convention: uncovered pixels read exactly camera_height
    assert depth[~got].min() == depth[~got].max() == CAMERA_HEIGHT
    # depth plausibility on the cloth: within the particle y range
    y = np.asarray(grid_pts, np.float64)[..., 1]
    assert depth[got].min() >= CAMERA_HEIGHT - y.max() - 0.02
    v = iou(gt, got)
    assert v >= min_iou, f"mask IoU {v:.4f} < {min_iou}"
    return v


class TestRenderFidelity:
    def test_flat_cloth(self):
        dim = 64
        pos = grid_positions(dim, dim, lower=(0.0, 0.006, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        check_scene(pos.reshape(dim, dim, 3))

    def test_crumpled_task_state(self):
        # a real crumpled start from the committed hard eval set
        with h5py.File("data_r3/rect_eval_hard_100.hdf5", "r") as f:
            k = sorted(f.keys())[0]
            g = f[k]
            pos = g["particle_pos"][:].reshape(-1, 4)[:, :3]
            dimx = int(g.attrs["cloth_size"][0]) \
                if "cloth_size" in g.attrs else None
        if dimx is None:
            n = pos.shape[0]
            dimx = int(round(np.sqrt(n)))
        dimy = pos.shape[0] // dimx
        check_scene(pos[: dimx * dimy].reshape(dimy, dimx, 3))

    def test_mid_fling_drape(self):
        # synthetic mid-fling: cloth draped from two lifted corners (a
        # catenary-ish sheet with strong depth variation + silhouette)
        dim = 64
        pos = grid_positions(dim, dim, lower=(0.0, 0.0, 0.0))
        g = pos.reshape(dim, dim, 3).astype(np.float64)
        g[..., 0] -= g[..., 0].mean()
        g[..., 2] -= g[..., 2].mean()
        # folded sheet: y rises along rows, with a sinusoidal wrinkle
        yy = np.linspace(0.01, 0.5, dim)[:, None]
        g[..., 1] = yy + 0.03 * np.abs(np.sin(
            np.linspace(0, 6 * np.pi, dim)))[None, :]
        # compress z as it lifts (hanging foreshortening)
        g[..., 2] *= np.cos(np.linspace(0, 1.2, dim))[:, None]
        check_scene(g)
