"""Self-collision: hash-grid neighbor search + particle contact projection.

The NvFlex solver's per-step pipeline builds a spatial hash grid (create cell
indices -> radix sort -> create grid -> reorder -> collideParticles; the
stage names are documented by its timers, reference:
PyFlex/include/NvFlex.h:197-223) and filters pairs that are neighbors in the
rest configuration (eNvFlexPhaseSelfCollideFilter, NvFlex.h:165-166).

TPU-native design: everything fixed-shape and SoA.  Particles are keyed by a
hashed cell id, argsorted, and each particle probes the 27 neighboring cells
with a binary search into the sorted keys, taking up to K_CELL candidates
per cell.  The K nearest surviving candidates per particle are kept as a
(K, N) neighbor table (N in the lane dimension), rebuilt once per step and
reused by every substep's contact projection (Jacobi, one-sided: each side
of a pair computes its own push, so no scatters are needed).
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


def _cell_hash(cx, cy, cz) -> jnp.ndarray:
    h = (cx * _P1) ^ (cy * _P2) ^ (cz * _P3)
    return h & (HASH_SIZE - 1)


def _gather_candidates(pos, active, cell_size):
    """pos (3, N).  Returns (cand_idx (C, N) i32, cand_ok (C, N) bool) with
    C = 27 * K_CELL candidate particle ids per particle."""
    n = pos.shape[1]
    cell = jnp.floor(pos / cell_size).astype(jnp.int32)  # (3, N)
    h = _cell_hash(cell[0], cell[1], cell[2])
    key = jnp.where(active, h, HASH_SIZE)  # park inactive at the end
    order = jnp.argsort(key)
    skey = key[order]

    ks = jnp.arange(K_CELL)[:, None]  # (K_CELL, 1)
    cand_idx, cand_ok = [], []
    for off in _OFFSETS:
        hq = _cell_hash(cell[0] + off[0], cell[1] + off[1], cell[2] + off[2])
        start = jnp.searchsorted(skey, hq)  # (N,)
        slots = jnp.minimum(start[None, :] + ks, n - 1)  # (K_CELL, N)
        ok = skey[slots] == hq[None, :]
        cand_idx.append(order[slots])
        cand_ok.append(ok)
    return jnp.concatenate(cand_idx, axis=0), jnp.concatenate(cand_ok, axis=0)


def _select_k_nearest(pos, active, cand_idx, cand_ok, radius, rest_filter):
    """Distance-filter candidates, keep K_NEIGHBORS nearest -> (K, N)."""
    n = pos.shape[1]
    pj = pos[:, cand_idx]  # (3, C, N)
    d = pos[:, None, :] - pj
    dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]  # (C, N)
    me = jnp.arange(n)[None, :]
    ok = (
        cand_ok
        & active[cand_idx]
        & active[None, :]
        & (cand_idx != me)
        & (dist2 < radius * radius)
        & ~rest_filter
    )
    score = jnp.where(ok, -dist2, -jnp.inf)  # (C, N)
    top_score, top_pos = jax.lax.top_k(score.T, K_NEIGHBORS)  # (N, K)
    nbr_idx = jnp.take_along_axis(cand_idx.T, top_pos, axis=1)  # (N, K)
    nbr_mask = top_score > -jnp.inf
    return nbr_idx.T, nbr_mask.T  # (K, N)


def find_neighbors_grid(pos, active, lattice_w: int, radius):
    """Neighbor table for grid cloths in lattice-flat layout; pos (3, N).

    The SelfCollideFilter drops pairs whose *lattice* index distance is <= 1
    in both axes — exactly the pairs whose rest distance is below the
    interaction radius (spacing 0.00625 vs radius 0.01125)."""
    cand_idx, cand_ok = _gather_candidates(pos, active, radius)
    me = jnp.arange(pos.shape[1])[None, :]
    my_y, my_x = me // lattice_w, me % lattice_w
    cy, cx = cand_idx // lattice_w, cand_idx % lattice_w
    rest_filter = (jnp.abs(cy - my_y) <= 1) & (jnp.abs(cx - my_x) <= 1)
    return _select_k_nearest(pos, active, cand_idx, cand_ok, radius,
                             rest_filter)


def find_neighbors_hash(pos, active, radius, rest_positions):
    """Neighbor table for mesh cloths; pos/rest_positions (3, N); rest-pose
    filter by actual rest distance (NvFlex.h:166)."""
    cand_idx, cand_ok = _gather_candidates(pos, active, radius)
    rj = rest_positions[:, cand_idx]  # (3, C, N)
    rd = rest_positions[:, None, :] - rj
    rest_filter = (rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2]
                   < radius * radius)
    return _select_k_nearest(pos, active, cand_idx, cand_ok, radius,
                             rest_filter)


def solve_contacts(P, w, moving_mask, nbr_idx, nbr_mask, *, rest_dist):
    """Project particle-particle contacts from a cached (K, N) neighbor
    table.  P: (3, ...) SoA (grid lattice or flat).

    One-sided Jacobi: each particle pushes itself out of each neighbor by
    its mass share; summed over both sides of a pair this yields the full
    separation.  Corrections are averaged over the live-contact count
    (local relaxation)."""
    shape = P.shape
    Pf = P.reshape(3, -1)  # (3, N)
    wf = w.reshape(-1)
    mf = moving_mask.reshape(-1)

    Pj = Pf[:, nbr_idx]  # (3, K, N)
    wj = wf[nbr_idx]  # (K, N)
    d = Pf[:, None, :] - Pj
    dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + _EPS)
    pen = rest_dist - dist
    wsum = wf[None, :] + wj
    ok = nbr_mask & (pen > 0) & (wsum > 0)
    s = jnp.where(ok, pen / ((wsum + _EPS) * dist), 0.0)  # (K, N)
    delta = jnp.sum((wf[None, None, :] * s[None]) * d, axis=1)  # (3, N)
    cnt = jnp.sum(ok, axis=0)  # (N,)
    delta = delta / jnp.maximum(cnt, 1)[None]
    Pf = jnp.where(mf[None], Pf + delta, Pf)
    return Pf.reshape(shape)


# --------------------------------------------------------------------------
# Morton-sorted sweep contacts (the TPU fast path)
# --------------------------------------------------------------------------
#
# The hash-grid + gather path above is exact but gather-bound on TPU (the
# candidate gathers dominate the whole solver).  The production path instead
# sorts particles along a 3D Morton curve once per step; spatially-near
# particles land near each other in sorted order, so contact candidates are
# just +-WINDOW neighbors in the sorted array — pure jnp.roll + elementwise
# compare, zero gathers in the per-substep loop.  Missed boundary pairs are
# caught on later steps as the curve re-sorts (PBD contact projection is
# self-correcting), matching FleX's own bounded-neighbor behavior
# (maxNeighborsPerParticle, main.cpp:826).

SWEEP_WINDOW = 10


def _part1by2(x):
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_code(cell):
    """cell (3, N) int32 in [0, 1024) -> (N,) int32 Morton codes."""
    return (
        _part1by2(cell[0])
        | (_part1by2(cell[1]) << 1)
        | (_part1by2(cell[2]) << 2)
    )


def sweep_order(pos, active, cell_size):
    """Build the per-step sorted ordering.  pos (3, N).
    Returns (perm (N,), inv_perm (N,))."""
    n = pos.shape[1]
    cell = jnp.clip(
        jnp.floor(pos / cell_size).astype(jnp.int32) + 512, 0, 1023)
    code = morton_code(cell)
    key = jnp.where(active, code, jnp.int32(2 ** 30))  # inactive to the end
    perm = jnp.argsort(key)
    inv_perm = jnp.zeros(n, jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv_perm


def solve_contacts_sweep(
    P, w, moving_mask, perm, inv_perm, params, *, rest_dist,
    window: int = SWEEP_WINDOW, iterations: int = 8,
    lattice_w=None, rest_sorted=None, active=None, prev=None,
):
    """Iterated contact projection in Morton-sorted space.  P (3, ...) SoA.

    The permutation gathers are hoisted: positions are gathered into sorted
    order ONCE, then `iterations` Jacobi passes of +-window roll-compare
    contact projection (with PBD Coulomb particle friction,
    NvFlexParams.particleFriction semantics, NvFlex.h:107) plus the ground
    plane run entirely in sorted space, then ONE gather back.  This mirrors
    FleX solving contacts inside its iteration loop rather than once per
    substep (solveContacts stage, NvFlex.h:197-223).

    rest-pose filtering: for grid cloths pass lattice_w (skip pairs with
    lattice index distance <= 1 in both axes); for meshes pass rest_sorted
    (3, N) = rest positions already permuted by `perm`."""
    shape = P.shape
    Pf = P.reshape(3, -1)
    wf = w.reshape(-1)
    mf = moving_mask.reshape(-1)
    n = Pf.shape[1]

    ws = wf[perm]
    ids = perm  # original index of each sorted slot
    act_s = (mf if active is None else active.reshape(-1))[perm]
    ms = mf[perm]
    idx = jnp.arange(n)
    mu_p = params.particle_friction * params.dynamic_friction

    Ps0 = Pf[:, perm]
    prev_s = (prev.reshape(3, -1)[:, perm]) if prev is not None else Ps0

    # static pair masks per k (independent of positions)
    pair_static = []
    for k in list(range(1, window + 1)) + list(range(-window, 0)):
        ok = (idx + k >= 0) & (idx + k < n) & act_s & jnp.roll(act_s, -k)
        if lattice_w is not None:
            idn = jnp.roll(ids, -k)
            my_y, my_x = ids // lattice_w, ids % lattice_w
            ny, nx = idn // lattice_w, idn % lattice_w
            ok = ok & ~((jnp.abs(ny - my_y) <= 1) & (jnp.abs(nx - my_x) <= 1))
        if rest_sorted is not None:
            rn = jnp.roll(rest_sorted, -k, axis=1)
            rd = rest_sorted - rn
            rest2 = rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2]
            ok = ok & (rest2 >= rest_dist * rest_dist)
        pair_static.append(ok)

    def one_iter(_, Ps):
        delta = jnp.zeros_like(Ps)
        count = jnp.zeros(n, Ps.dtype)
        Ds = Ps - prev_s
        for i, k in enumerate(list(range(1, window + 1))
                              + list(range(-window, 0))):
            Pn = jnp.roll(Ps, -k, axis=1)
            wn = jnp.roll(ws, -k)
            d = Ps - Pn
            dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + _EPS)
            pen = rest_dist - dist
            wsum = ws + wn
            ok = pair_static[i] & (pen > 0) & (wsum > 0)
            s = jnp.where(ok, pen / ((wsum + _EPS) * dist), 0.0)
            delta = delta + (ws * s)[None] * d
            count = count + ok
            # particle Coulomb friction on the pair's tangential motion
            rel = Ds - jnp.roll(Ds, -k, axis=1)
            nhat = d / dist[None]
            rel_n = rel[0] * nhat[0] + rel[1] * nhat[1] + rel[2] * nhat[2]
            t0 = rel[0] - rel_n * nhat[0]
            t1 = rel[1] - rel_n * nhat[1]
            t2 = rel[2] - rel_n * nhat[2]
            t_norm = jnp.sqrt(t0 * t0 + t1 * t1 + t2 * t2 + _EPS)
            fr = jnp.minimum(1.0, mu_p * pen / t_norm)
            fscale = jnp.where(ok, (ws / (wsum + _EPS)) * fr, 0.0)
            delta = delta - fscale[None] * jnp.stack([t0, t1, t2])
        Ps = Ps + jnp.where(
            ms[None], delta / jnp.maximum(count, 1.0)[None], 0.0)
        # ground plane (same math as solver.solve_plane, in sorted space)
        y = Ps[1]
        pen = params.collision_distance - y
        contact = (pen > 0) & ms
        dy_ = jnp.where(contact, pen, 0.0)
        dx_ = Ps[0] - prev_s[0]
        dz_ = Ps[2] - prev_s[2]
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        scale = jnp.minimum(
            1.0, params.dynamic_friction * jnp.maximum(pen, 0.0) / t_norm)
        f = jnp.where(contact, scale, 0.0)
        return jnp.stack([Ps[0] - dx_ * f, Ps[1] + dy_, Ps[2] - dz_ * f])

    Ps = jax.lax.fori_loop(0, iterations, one_iter, Ps0)
    Pf = jnp.where(mf[None], Ps[:, inv_perm], Pf)
    return Pf.reshape(shape)
