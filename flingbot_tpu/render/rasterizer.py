"""On-device RGB-D renderer: z-buffered particle splatting.

Replaces both of the reference's observation renderers — the in-process
OpenGL/EGL path (PyFlex/bindings/opengl/shadersGL.cpp, read back via
pyflex.render, pyflex.cpp:924-1133) and the Blender subprocess path
(environment/utils.py:59-92) — with a JAX kernel, so obs never leave the
chip and the renderer vmaps over environments.

Design: the cloth is a dense particle sheet whose projected spacing is a
couple of pixels, so z-buffered disk splats of each particle reproduce the
surface a mesh rasterizer would draw at observation resolution.  Splatting
is a fixed KxK stamp per particle + scatter-min over a flat (S*S,) depth
buffer — fixed shapes, fully fused by XLA, no host sync.  Depth follows the
linear eye-space convention (camera.py); pixels nothing covers read as the
floor plane (depth = camera_height - floor height = 2.0).

Shading: Lambertian with a fixed directional light; per-pixel normals are
recovered from the depth buffer by finite differences, which is visually
equivalent to the flat-shaded GL cloth at 64x64 observation scale and keeps
the whole pass elementwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.render.camera import CAMERA_FOV, CAMERA_HEIGHT, focal_length

DEFAULT_CLOTH_COLOR = (0.35, 0.35, 0.85)  # reference GL cloth is blue-ish
DEFAULT_FLOOR_COLOR = (0.9, 0.9, 0.9)
_LIGHT = (0.3, 0.8, 0.5)


def _hsv_to_rgb(h, s, v):
    """Scalar traced HSV -> (3,) RGB (the reference jitters the cloth BSDF
    color in HSV, render_rgbd.py:38-44)."""
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = jnp.mod(i, 6.0).astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b])


def _fbm_noise(key, image_size: int, octaves=(9, 17, 33)):
    """Multi-octave value noise in [0,1] — the on-device stand-in for the
    reference's Blender Musgrave floor texture (render_rgbd.py:20-35)."""
    total = jnp.zeros((image_size, image_size))
    amp = 1.0
    norm = 0.0
    for i, g in enumerate(octaves):
        key, sub = jax.random.split(key)
        grid = jax.random.uniform(sub, (g, g))
        up = jax.image.resize(grid, (image_size, image_size), "bilinear")
        total = total + amp * up
        norm += amp
        amp *= 0.55
    return total / norm


def domain_randomized_palette(dr_key, image_size: int):
    """Per-episode randomized (cloth_color (3,), floor_rgb (S,S,3)).

    Mirrors the reference's domain randomization: random Musgrave floor
    texture + random cloth HSV color per rendered observation episode
    (reference: render_rgbd.py:10-54, README.md:178-184)."""
    k_h, k_s, k_v, k_f1, k_f2, k_n = jax.random.split(dr_key, 6)
    cloth = _hsv_to_rgb(
        jax.random.uniform(k_h),
        jax.random.uniform(k_s, minval=0.45, maxval=1.0),
        jax.random.uniform(k_v, minval=0.4, maxval=0.95),
    )
    c1 = jax.random.uniform(k_f1, (3,), minval=0.15, maxval=1.0)
    c2 = jax.random.uniform(k_f2, (3,), minval=0.15, maxval=1.0)
    t = _fbm_noise(k_n, image_size)
    floor = c1[None, None, :] + t[..., None] * (c2 - c1)[None, None, :]
    return cloth, floor


def _surface_subdiv(image_size: int) -> int:
    """Barycentric subdivision level m: sample spacing along a triangle leg
    is legpx/m; legs project to ~0.00434 * S px (0.00625 m spacing over the
    1.44 m view), so m ~ S/160 keeps samples under ~0.8 px apart with a
    stretch margin."""
    return max(2, int(np.ceil(image_size * 0.0062)))


def surface_sample_points(positions, faces, tri_mask, m: int):
    """Dense barycentric surface samples — on-device TRIANGLE rasterization
    (the reference's GL path, shadersGL.cpp:3253-3330): every face is
    sampled on the barycentric lattice {(i/m, j/m): i+j <= m} and each
    sample marks ONLY its containing pixel (single-pixel stamp), so the
    mask has no splat dilation; mask IoU >= 0.95 vs a dense ground-truth
    rasterization on crumpled scenes (tests/test_render_fidelity.py).

    positions (N, 3); faces (T, 3) i32 (padded); tri_mask (T,).
    Returns (pts (K*T, 3), active (K*T,)) with K = (m+1)(m+2)/2."""
    a = positions[faces[:, 0]]
    b = positions[faces[:, 1]]
    c = positions[faces[:, 2]]
    us, vs = [], []
    for i in range(m + 1):
        for j in range(m + 1 - i):
            us.append(i / m)
            vs.append(j / m)
    u = jnp.asarray(us, positions.dtype)[:, None, None]
    v = jnp.asarray(vs, positions.dtype)[:, None, None]
    pts = a[None] * (1.0 - u - v) + b[None] * u + c[None] * v  # (K, T, 3)
    K = len(us)
    act = jnp.tile(tri_mask, K)
    return pts.reshape(-1, 3), act


def _splat_depth(positions, active, image_size, splat_radius_px, k,
                 camera_height):
    """Scatter-min particle disks into a flat depth buffer."""
    f = focal_length(image_size)
    c = image_size / 2.0
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    depth = camera_height - y
    safe = jnp.maximum(depth, 1e-4)
    col = x * f / safe + c
    row = -z * f / safe + c

    r0 = jnp.round(row).astype(jnp.int32)
    c0 = jnp.round(col).astype(jnp.int32)

    offs = jnp.arange(k) - (k // 2)
    dr = offs[:, None]
    dc = offs[None, :]
    disk = (dr * dr + dc * dc) <= splat_radius_px * splat_radius_px  # (k, k)

    rr = r0[:, None, None] + dr[None]  # (N, k, k)
    cc = c0[:, None, None] + dc[None]
    inside = (
        (rr >= 0) & (rr < image_size) & (cc >= 0) & (cc < image_size)
        & disk[None] & active[:, None, None]
    )
    flat_idx = jnp.where(inside, rr * image_size + cc, image_size * image_size)
    zval = jnp.broadcast_to(depth[:, None, None], flat_idx.shape)

    buf = jnp.full((image_size * image_size,), jnp.float32(camera_height))
    buf = buf.at[flat_idx.reshape(-1)].min(zval.reshape(-1), mode="drop")
    return buf.reshape(image_size, image_size)


@functools.partial(
    jax.jit, static_argnames=("image_size", "k", "splat_radius_px")
)
def render_depth(
    positions,
    active,
    image_size: int = 400,
    splat_radius_px: float = 2.5,
    k: int = 7,
    camera_height: float = CAMERA_HEIGHT,
    faces=None,
    tri_mask=None,
):
    """(N,3) particles -> (S,S) linear depth image (floor = camera_height).

    With `faces`/`tri_mask` the surface is densely barycentric-sampled and
    stamped per-pixel — triangle-rasterizer-grade masks (see
    surface_sample_points)."""
    if faces is not None:
        pts, act = surface_sample_points(
            positions, faces, tri_mask, _surface_subdiv(image_size))
        positions = jnp.concatenate([positions, pts])
        active = jnp.concatenate([active, act])
        splat_radius_px, k = 0.5, 1
    return _splat_depth(
        positions, active, image_size, splat_radius_px, k, camera_height
    )


@functools.partial(
    jax.jit, static_argnames=("image_size", "k", "splat_radius_px")
)
def render_rgbd(
    positions,
    active,
    image_size: int = 400,
    cloth_color=DEFAULT_CLOTH_COLOR,
    floor_color=DEFAULT_FLOOR_COLOR,
    splat_radius_px: float = 2.5,
    k: int = 7,
    camera_height: float = CAMERA_HEIGHT,
    dr_key=None,
    faces=None,
    tri_mask=None,
):
    """(N,3) particles -> (rgb (S,S,3) in [0,1], depth (S,S) linear).

    Matches the reference obs contract: get_image / blender_render_cloth
    return (color, depth) with the floor at depth 2.0.  When `dr_key` (a
    PRNGKey) is given, cloth color and floor texture are domain-randomized
    from it (render_rgbd.py:10-54 parity) — pass a per-episode key.  With
    `faces`/`tri_mask` the surface is triangle-super-sampled (see
    render_depth)."""
    if faces is not None:
        pts, act = surface_sample_points(
            positions, faces, tri_mask, _surface_subdiv(image_size))
        positions = jnp.concatenate([positions, pts])
        active = jnp.concatenate([active, act])
        splat_radius_px, k = 0.5, 1
    depth = _splat_depth(
        positions, active, image_size, splat_radius_px, k, camera_height
    )
    is_cloth = depth < camera_height - 1e-4

    # normals from the depth buffer: world xz per-pixel scale is depth/f
    f = focal_length(image_size)
    dzdr = (jnp.roll(depth, -1, axis=0) - jnp.roll(depth, 1, axis=0)) * 0.5
    dzdc = (jnp.roll(depth, -1, axis=1) - jnp.roll(depth, 1, axis=1)) * 0.5
    px_world = depth / f
    nx = -dzdc / jnp.maximum(px_world, 1e-6)
    nz = dzdr / jnp.maximum(px_world, 1e-6)
    ny = jnp.ones_like(depth)
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    light = jnp.asarray(_LIGHT)
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(
        (nx * light[0] + ny * light[1] + nz * light[2]) / norm, 0.0, 1.0
    )
    shade = 0.55 + 0.45 * lam

    if dr_key is not None:
        cloth_c, floor = domain_randomized_palette(dr_key, image_size)
        cloth = cloth_c[None, None, :] * shade[..., None]
    else:
        cloth = jnp.asarray(cloth_color)[None, None, :] * shade[..., None]
        floor = jnp.broadcast_to(
            jnp.asarray(floor_color)[None, None, :], cloth.shape
        )
    rgb = jnp.where(is_cloth[..., None], cloth, floor)
    return jnp.clip(rgb, 0.0, 1.0), depth


def cloth_mask_from_depth(depth, camera_height: float = CAMERA_HEIGHT):
    """Cloth mask = anything nearer than the floor (simEnv.py:235)."""
    return depth < camera_height - 1e-4
