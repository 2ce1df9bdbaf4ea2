"""Self-collision: hash-grid neighbor search + particle contact projection.

The NvFlex solver's per-step pipeline builds a spatial hash grid (create cell
indices -> radix sort -> create grid -> reorder -> collideParticles; the
stage names are documented by its timers, reference:
PyFlex/include/NvFlex.h:197-223) and filters pairs that are neighbors in the
rest configuration (eNvFlexPhaseSelfCollideFilter, NvFlex.h:165-166).

TPU-native design: everything fixed-shape.  Particles are keyed by a hashed
cell id, argsorted, and each particle probes the 27 neighboring cells with a
binary search into the sorted keys, taking up to K_CELL candidates per cell.
The K nearest surviving candidates per particle are kept as an (N, K)
neighbor table, rebuilt once per step and reused by every substep's contact
projection (Jacobi, one-sided: each side of a pair computes its own push, so
no scatters are needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9

HASH_BITS = 13
HASH_SIZE = 1 << HASH_BITS
K_CELL = 4  # candidates taken per probed cell
K_NEIGHBORS = 8  # kept contacts per particle

_P1, _P2, _P3 = 73856093, 19349663, 83492791

_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def _cell_hash(cell: jnp.ndarray) -> jnp.ndarray:
    """cell: (..., 3) int32 -> (...,) int32 in [0, HASH_SIZE)."""
    h = (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)
    return h & (HASH_SIZE - 1)


def _gather_candidates(pos, active, cell_size):
    """Shared hash-grid probe.  Returns (cand_idx (N, 27*K_CELL) i32,
    cand_ok (N, 27*K_CELL) bool) — candidate particle ids per particle."""
    n = pos.shape[0]
    cell = jnp.floor(pos / cell_size).astype(jnp.int32)
    h = _cell_hash(cell)
    key = jnp.where(active, h, HASH_SIZE)  # park inactive at the end
    order = jnp.argsort(key)
    skey = key[order]

    cand_idx, cand_ok = [], []
    ks = jnp.arange(K_CELL)
    for off in _OFFSETS:
        hq = _cell_hash(cell + jnp.array(off, jnp.int32))
        start = jnp.searchsorted(skey, hq)
        slots = jnp.minimum(start[:, None] + ks[None, :], n - 1)
        ok = skey[slots] == hq[:, None]
        cand_idx.append(order[slots])
        cand_ok.append(ok)
    return jnp.concatenate(cand_idx, axis=1), jnp.concatenate(cand_ok, axis=1)


def _select_k_nearest(pos, active, cand_idx, cand_ok, radius, rest_filter):
    """Distance-filter candidates and keep the K_NEIGHBORS nearest."""
    n = pos.shape[0]
    pj = pos[cand_idx]  # (N, C, 3)
    d = pos[:, None, :] - pj
    dist2 = jnp.sum(d * d, axis=-1)
    me = jnp.arange(n)[:, None]
    ok = (
        cand_ok
        & active[cand_idx]
        & active[:, None]
        & (cand_idx != me)
        & (dist2 < radius * radius)
        & ~rest_filter
    )
    score = jnp.where(ok, -dist2, -jnp.inf)
    top_score, top_pos = jax.lax.top_k(score, K_NEIGHBORS)
    nbr_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
    nbr_mask = top_score > -jnp.inf
    return nbr_idx, nbr_mask


def find_neighbors_grid(pos, active, lattice_w: int, radius):
    """Neighbor table for grid cloths in lattice-flat layout.

    The SelfCollideFilter drops pairs whose *lattice* index distance is <= 1
    in both axes — exactly the pairs whose rest distance is below the
    interaction radius (spacing 0.00625 vs radius 0.01125)."""
    cand_idx, cand_ok = _gather_candidates(pos, active, radius)
    me = jnp.arange(pos.shape[0])[:, None]
    my_y, my_x = me // lattice_w, me % lattice_w
    cy, cx = cand_idx // lattice_w, cand_idx % lattice_w
    rest_filter = (jnp.abs(cy - my_y) <= 1) & (jnp.abs(cx - my_x) <= 1)
    return _select_k_nearest(pos, active, cand_idx, cand_ok, radius, rest_filter)


def find_neighbors_hash(pos, active, radius, rest_positions):
    """Neighbor table for mesh cloths; rest-pose filter by actual rest
    distance (NvFlex.h:166)."""
    cand_idx, cand_ok = _gather_candidates(pos, active, radius)
    rj = rest_positions[cand_idx]
    rd = rest_positions[:, None, :] - rj
    rest_filter = jnp.sum(rd * rd, axis=-1) < radius * radius
    return _select_k_nearest(pos, active, cand_idx, cand_ok, radius, rest_filter)


def solve_contacts(P, w, moving_mask, nbr_idx, nbr_mask, *, rest_dist,
                   particle_friction=0.0, prev=None):
    """Project particle-particle contacts from a cached neighbor table.

    One-sided Jacobi: each particle pushes itself out of each neighbor by its
    mass share; summed over both sides of a pair this yields the full
    separation.  Corrections are averaged over the live-contact count
    (local relaxation)."""
    shape = P.shape
    Pf = P.reshape(-1, 3)
    wf = w.reshape(-1)
    mf = moving_mask.reshape(-1)
    ni = nbr_idx.reshape(Pf.shape[0], -1)
    nm = nbr_mask.reshape(Pf.shape[0], -1)

    Pj = Pf[ni]
    wj = wf[ni]
    d = Pf[:, None, :] - Pj
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    pen = rest_dist - dist
    wsum = wf[:, None] + wj
    ok = nm & (pen > 0) & (wsum > 0)
    s = jnp.where(ok, pen / (wsum + _EPS), 0.0)
    delta = jnp.sum((wf[:, None] * s)[..., None] * (d / dist[..., None]), axis=1)
    cnt = jnp.sum(ok, axis=1)
    delta = delta / jnp.maximum(cnt, 1)[:, None]
    Pf = jnp.where(mf[:, None], Pf + delta, Pf)
    return Pf.reshape(shape)
