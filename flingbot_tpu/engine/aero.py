"""Cloth aerodynamics: drag / lift / wind forces on the cloth surface.

NvFlexParams semantics (reference PyFlex/include/NvFlex.h:120-122): drag
and lift act on dynamic triangles against the relative wind.  The flingbot
scene leaves all three at zero (main.cpp:753-764 defaults, never overridden
by softgym_cloth.h), so this is OFF by default (`aero=False` in
solver.step) and exists for NvFlexParams surface completeness and for users
who want air resistance during flings.

TPU formulation: per-particle surface normals instead of per-triangle
gathers — for grid cloths the normal is the cross product of the two
stencil tangents (pure shifts); meshes reuse the same formula on a
particle's edge-neighbor tangents.  Force model (standard cloth aero):

    v_rel = v - wind
    f = -( drag * (v_rel . n) n + lift * t ) * |v_rel|,  t = tangential part

applied as acceleration through the inverse mass during predict.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def grid_normals(P, valid):
    """Per-particle normals of a lattice cloth P (3, H, W) from central
    differences of the two surface tangents."""
    from flingbot_tpu.engine.solver import shift2d

    ty = shift2d(P, 1, 0) - shift2d(P, -1, 0)
    tx = shift2d(P, 0, 1) - shift2d(P, 0, -1)
    n0 = ty[1] * tx[2] - ty[2] * tx[1]
    n1 = ty[2] * tx[0] - ty[0] * tx[2]
    n2 = ty[0] * tx[1] - ty[1] * tx[0]
    norm = jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2 + _EPS)
    n = jnp.stack([n0, n1, n2]) / norm[None]
    return jnp.where(valid[None], n, 0.0)


def mesh_normals(P, triangles, tri_mask, active):
    """Per-particle normals of a mesh cloth P (3, N): area-weighted face
    normals accumulated to vertices (the dynamic-triangle formulation
    NvFlex's drag/lift acts on, NvFlex.h:120-122), then normalized.
    triangles (T, 3) i32 padded, tri_mask (T,) bool."""
    a = P[:, triangles[:, 0]]  # (3, T)
    b = P[:, triangles[:, 1]]
    c = P[:, triangles[:, 2]]
    e1 = b - a
    e2 = c - a
    fn0 = e1[1] * e2[2] - e1[2] * e2[1]
    fn1 = e1[2] * e2[0] - e1[0] * e2[2]
    fn2 = e1[0] * e2[1] - e1[1] * e2[0]
    fn = jnp.stack([fn0, fn1, fn2])  # (3, T), length = 2*area
    fn = jnp.where(tri_mask[None], fn, 0.0)
    fn_mag = jnp.sqrt(fn[0] ** 2 + fn[1] ** 2 + fn[2] ** 2)
    acc = jnp.zeros_like(P)
    area_sum = jnp.zeros(P.shape[1], P.dtype)
    for k in range(3):
        acc = acc.at[:, triangles[:, k]].add(fn)
        area_sum = area_sum.at[triangles[:, k]].add(fn_mag)
    # Coherence-scaled normal: |n| = |sum fn| / sum |fn| in [0, 1].  At a
    # fold or seam where adjacent faces' normals cancel, the per-triangle
    # NvFlex formulation (NvFlex.h:120-122) yields ~zero NET normal force;
    # dividing the vector sum by the scalar area sum reproduces that
    # (n -> 0) instead of normalizing numerical residue into a full unit
    # vector of arbitrary direction.  On a coherent surface |n| = 1
    # exactly, matching grid_normals.
    n = acc / jnp.maximum(area_sum, 1e-12)[None]
    return jnp.where(active[None], n, 0.0)


def aero_accel(V, normals, params, moving_mask):
    """Acceleration from drag/lift/wind.  V, normals (3, ...)."""
    shape_tail = (1,) * (V.ndim - 1)
    wind = params.wind.reshape((3,) + shape_tail)
    vr = V - wind
    speed = jnp.sqrt(vr[0] ** 2 + vr[1] ** 2 + vr[2] ** 2 + _EPS)
    vn = vr[0] * normals[0] + vr[1] * normals[1] + vr[2] * normals[2]
    normal_part = vn[None] * normals
    tangential = vr - normal_part
    f = -(params.drag * normal_part + params.lift * tangential) * speed[None]
    return jnp.where(moving_mask[None], f, 0.0)
