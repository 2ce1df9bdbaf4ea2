"""Batched rotation/scale observation transforms.

The reference builds its spatial action space by rendering one top-down
RGB-D image and re-sampling it 96 ways (12 rotations x 8 scales), each a
scipy rotate + center-crop/pad + resize on the CPU, fanned out over Ray
workers (learning/nets.py:155-193).  Here all 96 views are ONE batched
bilinear gather on device: each output pixel of each view maps to a source
pixel through a 2x3 affine, so the whole stack is a single fused kernel.

Convention: a view with (rotation theta, scale s) samples the source image
on a grid that is rotated by theta (counter-clockwise, matching
scipy.ndimage.rotate in the row/col plane) and spans s * source_extent,
resized to (dim, dim).  `transform_pixels_to_source` is the exact inverse
used for action decoding — the analog of get_transform_matrix /
pixels_to_3d_positions (environment/utils.py:161-276), minus the
double-negation quirk the reference carries (utils.py:244).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rot(theta_deg):
    t = jnp.deg2rad(theta_deg)
    c, s = jnp.cos(t), jnp.sin(t)
    return jnp.asarray([[c, -s], [s, c]])


def affine_out_to_src(rotation_deg, scale, src_dim: int, out_dim: int):
    """2x2 matrix + offset mapping output (row, col) -> source (row, col)."""
    m = _rot(rotation_deg) * (scale * src_dim / out_dim)
    c_out = (out_dim - 1) / 2.0
    c_src = (src_dim - 1) / 2.0
    # src = m @ (out - c_out) + c_src
    return m, c_out, c_src


def _bilinear(img, rows, cols):
    """img (H, W, C) sampled at float (..., ) rows/cols, edge-clamped."""
    H, W = img.shape[0], img.shape[1]
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0 = jnp.clip(r0.astype(jnp.int32), 0, H - 1)
    c0 = jnp.clip(c0.astype(jnp.int32), 0, W - 1)
    r1 = jnp.clip(r0 + 1, 0, H - 1)
    c1 = jnp.clip(c0 + 1, 0, W - 1)
    v00 = img[r0, c0]
    v01 = img[r0, c1]
    v10 = img[r1, c0]
    v11 = img[r1, c1]
    fr = fr[..., None]
    fc = fc[..., None]
    return (
        v00 * (1 - fr) * (1 - fc)
        + v01 * (1 - fr) * fc
        + v10 * fr * (1 - fc)
        + v11 * fr * fc
    )


@functools.partial(jax.jit, static_argnames=("out_dim", "with_valid"))
def prepare_image(obs, rotations, scales, out_dim: int = 64,
                  with_valid: bool = False):
    """obs (H, W, C) -> (T, C, out_dim, out_dim) stack over the cartesian
    product of rotations x scales (prepare_image parity, nets.py:180-193;
    transformation order = product(rotations, scales), simEnv.py:136-138).

    rotations (R,) degrees, scales (S,) — may be traced (adaptive scaling).
    With with_valid=True an extra channel marks output pixels whose sample
    point fell inside the source image (out-of-range samples edge-clamp).
    """
    src_dim = obs.shape[0]
    R = rotations.shape[0]
    S = scales.shape[0]
    rot_grid = jnp.repeat(rotations, S)  # (T,) rotation varies slowest
    scale_grid = jnp.tile(scales, R)

    out_idx = jnp.arange(out_dim, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(out_idx, out_idx, indexing="ij")  # (D, D)

    def one(theta, s):
        m, c_out, c_src = affine_out_to_src(theta, s, src_dim, out_dim)
        dr = rr - c_out
        dc = cc - c_out
        src_r = m[0, 0] * dr + m[0, 1] * dc + c_src
        src_c = m[1, 0] * dr + m[1, 1] * dc + c_src
        out = _bilinear(obs, src_r, src_c)  # (D, D, C)
        if with_valid:
            ok = (
                (src_r >= 0) & (src_r <= src_dim - 1)
                & (src_c >= 0) & (src_c <= src_dim - 1)
            )
            out = jnp.concatenate(
                [out, ok[..., None].astype(out.dtype)], axis=-1)
        return out

    stack = jax.vmap(one)(rot_grid, scale_grid)  # (T, D, D, C[+1])
    return jnp.transpose(stack, (0, 3, 1, 2))


def transform_pixels_to_source(pixels, rotation_deg, scale, src_dim: int,
                               out_dim: int = 64):
    """Map (row, col) pixels in a transformed view back to source pixels —
    the action-decoding inverse (pixels_to_3d_positions parity,
    environment/utils.py:237-276).  pixels: (..., 2) float or int."""
    pixels = jnp.asarray(pixels, jnp.float32)
    m, c_out, c_src = affine_out_to_src(rotation_deg, scale, src_dim, out_dim)
    d = pixels - c_out
    src_r = m[0, 0] * d[..., 0] + m[0, 1] * d[..., 1] + c_src
    src_c = m[1, 0] * d[..., 0] + m[1, 1] * d[..., 1] + c_src
    return jnp.stack([src_r, src_c], axis=-1)


def preprocess_obs(rgb, depth):
    """RGB [0,1] or [0,255] + depth -> (4, H, W) obs (preprocess_obs parity,
    environment/utils.py:579-582; reference divides a uint8 rgb by 255)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    rgb = jnp.where(jnp.max(rgb) > 1.5, rgb / 255.0, rgb)
    depth = jnp.asarray(depth, jnp.float32)
    return jnp.concatenate([
        jnp.transpose(rgb, (2, 0, 1)),
        depth[None],
    ], axis=0)
