"""Top-down coverage metric — the reward signal.

Parity target: get_current_covered_area (reference:
environment/flex_utils.py:358-395): discretize the particle AABB in the
ground plane into a 100x100 grid, mark every cell within +-radius of a
particle (per-axis box test via index rounding), and return
covered_cells * cell_area.

TPU-native formulation: instead of building per-particle python index lists
(vectorized_range / vectorized_meshgrid in the reference), every particle
scatter-maxes a KxK stamp of ones into the grid, where K is a static bound
on how many cells the radius can span.  Fixed shapes, one fused kernel,
vmappable over envs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRID = 100
# Static bound on the per-axis cell span of one particle: the reference's
# index range is round((off+r)/span) - round((off-r)/span) cells.  With
# radius 0.00625 and a crumpled cloth of >= 0.09 m extent the span is
# <= 2*0.00625/0.0009 ~ 14 cells; 15 offsets (+-7) cover every realistic
# configuration (a flatter cloth spans far fewer).
K_SPAN = 15


def get_current_covered_area(
    positions: jnp.ndarray,
    active: "jnp.ndarray | None" = None,
    particle_radius: float = 0.00625,
) -> jnp.ndarray:
    """Covered area in m^2 of the (masked) particle cloud, seen top-down.

    positions: (N, 3); active: (N,) bool or None.
    """
    p = positions
    x, z = p[:, 0], p[:, 2]
    if active is None:
        active = jnp.ones(p.shape[0], bool)
    big = jnp.float32(1e9)
    min_x = jnp.min(jnp.where(active, x, big))
    max_x = jnp.max(jnp.where(active, x, -big))
    min_z = jnp.min(jnp.where(active, z, big))
    max_z = jnp.max(jnp.where(active, z, -big))
    span_x = (max_x - min_x) / GRID
    span_z = (max_z - min_z) / GRID
    span_x = jnp.maximum(span_x, 1e-6)
    span_z = jnp.maximum(span_z, 1e-6)

    off_x = x - min_x
    off_z = z - min_z
    r = particle_radius
    # same clamped index rounding as the reference (flex_utils.py:376-385)
    lo_x = jnp.maximum(jnp.round((off_x - r) / span_x).astype(jnp.int32), 0)
    hi_x = jnp.minimum(jnp.round((off_x + r) / span_x).astype(jnp.int32), GRID)
    lo_z = jnp.maximum(jnp.round((off_z - r) / span_z).astype(jnp.int32), 0)
    hi_z = jnp.minimum(jnp.round((off_z + r) / span_z).astype(jnp.int32), GRID)

    grid = jnp.zeros((GRID * GRID,), jnp.float32)
    ks = jnp.arange(K_SPAN)

    # stamp rows lo_x..hi_x x cols lo_z..hi_z (clipped like the reference's
    # idx = clip(xx*100 + yy, 0, 9999))
    ix = jnp.minimum(lo_x[:, None] + ks[None, :], hi_x[:, None])  # (N, K)
    iz = jnp.minimum(lo_z[:, None] + ks[None, :], hi_z[:, None])
    cell = ix[:, :, None] * GRID + iz[:, None, :]  # (N, K, K)
    cell = jnp.clip(cell, 0, GRID * GRID - 1)
    cell = jnp.where(active[:, None, None], cell, GRID * GRID)
    grid = grid.at[cell.reshape(-1)].max(1.0, mode="drop")
    stamped = jnp.sum(grid) * span_x * span_z

    # K_SPAN only covers the per-particle stamp while the cloth AABB extent
    # is >= ~(K_SPAN-2) cells of 2r; below that the stamp undercounts.  The
    # AABB fallback is exact only when BOTH axes are that bunched up (a wad,
    # whose footprint IS the radius-padded AABB).  A single thin axis (a
    # folded strip) keeps the stamp: dense particle spacing makes the
    # truncated stamps overlap, so it undercounts by a few percent at worst,
    # whereas the AABB would overcount concave strips unboundedly.
    r2 = jnp.float32(2.0 * r)
    degenerate = (span_x * (K_SPAN - 2) < r2) & (span_z * (K_SPAN - 2) < r2)
    aabb = (max_x - min_x + r2) * (max_z - min_z + r2)
    return jnp.where(degenerate, aabb, stamped)


get_current_covered_area_jit = jax.jit(get_current_covered_area)
