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


# --------------------------------------------------------------------------
# sort-based contact group (round-2 production path)
# --------------------------------------------------------------------------
#
# Round 1 cached an argsort permutation and applied it with gathers; on TPU
# a batched gather of (3, 10k) costs ~48 ms per direction at 512 envs while
# a multi-operand jax.lax.sort costs ~11 ms TOTAL (the sort network carries
# the payload with the keys).  So the round-2 contact group re-sorts fresh
# every invocation: one forward sort carries positions, previous positions
# and packed lattice ids into Morton order; the contact projection runs on
# the sorted arrays (pallas kernel or the XLA reference below); one inverse
# sort (keyed by the original flat index) restores lattice order.  No cached
# permutation state, no stale orderings.

INT32_BIG = jnp.int32(2 ** 30)


def pack_lattice_ids(n: int, lattice_w: int, active, immobile):
    """Per flat-lattice-slot packed id: lattice x (bits 0-7), lattice y
    (bits 8-19), immobile flag (bit 20), inactive flag (bit 21)."""
    from flingbot_tpu.engine.pallas_kernels import (
        PACK_IMMOBILE_BIT, PACK_INACTIVE_BIT)

    assert lattice_w <= 256, "packed lattice ids support max_dimx <= 256"
    i = jnp.arange(n, dtype=jnp.int32)
    iy = i // lattice_w
    ix = i % lattice_w
    return (ix | (iy << 8)
            | (immobile.astype(jnp.int32) << PACK_IMMOBILE_BIT)
            | ((~active).astype(jnp.int32) << PACK_INACTIVE_BIT))


def _contacts_sorted_flat(params, rest_dist, X, Y, Z, PX, PY, PZ, packed,
                          *, window, iterations, rest=None):
    """XLA reference of pallas_contacts on flat sorted (N,) arrays.
    Semantically identical math (used for cross-checking and as the CPU
    fallback); wraparound of jnp.roll is masked by in-range tests.

    SelfCollideFilter (NvFlex.h:166): grid mode (rest=None) drops lattice-
    neighbor pairs from the packed ids; mesh mode (rest = sorted (3, N)
    rest positions) drops pairs whose rest distance is under rest_dist."""
    from flingbot_tpu.engine.pallas_kernels import (
        PACK_IMMOBILE_BIT, PACK_INACTIVE_BIT)

    n = X.shape[0]
    lat_x = packed & 0xFF
    lat_y = (packed >> 8) & 0xFFF
    immobile = ((packed >> PACK_IMMOBILE_BIT) & 1) > 0
    inactive = ((packed >> PACK_INACTIVE_BIT) & 1) > 0
    active = ~inactive
    w = jnp.where(immobile | inactive, 0.0, 1.0)
    ms = active & ~immobile
    ms_f = ms.astype(X.dtype)
    i = jnp.arange(n, dtype=jnp.int32)
    mu_p = params.particle_friction * params.dynamic_friction

    ks = list(range(1, window + 1))
    static_k = []
    for k in ks:
        in_range = i < n - k
        act_n = jnp.roll(active, -k)
        if rest is None:
            lat_xn = jnp.roll(lat_x, -k)
            lat_yn = jnp.roll(lat_y, -k)
            nbr = ((jnp.abs(lat_xn - lat_x) <= 1)
                   & (jnp.abs(lat_yn - lat_y) <= 1))
        else:
            rd = rest - jnp.roll(rest, -k, axis=1)
            nbr = (rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2]
                   < rest_dist * rest_dist)
        ok = in_range & active & act_n & ~nbr
        wn = jnp.roll(w, -k)
        wsum = w + wn
        ok = ok & (wsum > 0)
        coef = jnp.where(ok, 1.0 / (wsum + _EPS), 0.0)
        dpx = PX - jnp.roll(PX, -k)
        dpy = PY - jnp.roll(PY, -k)
        dpz = PZ - jnp.roll(PZ, -k)
        static_k.append((ok, coef, wn, dpx, dpy, dpz))

    def one_iter(_, carry):
        X, Y, Z = carry
        acc_x = jnp.zeros(n, X.dtype)
        acc_y = jnp.zeros(n, X.dtype)
        acc_z = jnp.zeros(n, X.dtype)
        cnt = jnp.zeros(n, X.dtype)
        for idx, k in enumerate(ks):
            ok, coef, wn, dpx, dpy, dpz = static_k[idx]
            d0 = X - jnp.roll(X, -k)
            d1 = Y - jnp.roll(Y, -k)
            d2 = Z - jnp.roll(Z, -k)
            sq = d0 * d0 + d1 * d1 + d2 * d2 + _EPS
            r = jax.lax.rsqrt(sq)
            pen = rest_dist - sq * r
            live = pen > 0
            s = jnp.where(live, coef * pen * r, 0.0)
            live_f = jnp.where(live & ok, 1.0, 0.0)
            r0 = d0 - dpx
            r1 = d1 - dpy
            r2 = d2 - dpz
            rel_n = (r0 * d0 + r1 * d1 + r2 * d2) * (r * r)
            t0 = r0 - rel_n * d0
            t1 = r1 - rel_n * d1
            t2 = r2 - rel_n * d2
            tn_r = jax.lax.rsqrt(t0 * t0 + t1 * t1 + t2 * t2 + _EPS)
            fr = jnp.minimum(1.0, mu_p * jnp.maximum(pen, 0.0) * tn_r)
            fsc = jnp.where(live, coef * fr, 0.0)
            gx = s * d0 - fsc * t0
            gy = s * d1 - fsc * t1
            gz = s * d2 - fsc * t2
            acc_x = acc_x + w * gx - jnp.roll(wn * gx, k)
            acc_y = acc_y + w * gy - jnp.roll(wn * gy, k)
            acc_z = acc_z + w * gz - jnp.roll(wn * gz, k)
            cnt = cnt + live_f + jnp.roll(live_f, k)
        inv_cnt = ms_f / jnp.maximum(cnt, 1.0)
        X = X + acc_x * inv_cnt
        Y = Y + acc_y * inv_cnt
        Z = Z + acc_z * inv_cnt
        pen = params.collision_distance - Y
        contact_f = jnp.where(pen > 0, ms_f, 0.0)
        dx_ = X - PX
        dz_ = Z - PZ
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        f = contact_f * jnp.minimum(
            1.0, params.dynamic_friction * jnp.maximum(pen, 0.0) / t_norm)
        return (X - dx_ * f, Y + contact_f * pen, Z - dz_ * f)

    return jax.lax.fori_loop(0, iterations, one_iter, (X, Y, Z))


def contact_group(P, prev, w, active, params, *, rest_dist, lattice_w=None,
                  rest_positions=None, window: int = 16,
                  iterations: int = 8, backend: str = "pallas",
                  interpret: bool = False):
    """Full self-collision pass: Morton sort -> windowed pair projection
    (with PBD Coulomb particle friction + ground plane, NvFlex.h:105-107,
    165-166 semantics) -> inverse sort.

    P, prev: (3, N) flat layout; w: (N,); active: (N,) bool.  Returns P'
    (3, N).  Assumes uniform particle mass across the cloth (true for all
    flingbot scenes: softgym_cloth.h:63 sets one mass); grabbed particles
    (w == 0) are encoded immobile.

    SelfCollideFilter: pass lattice_w for grid cloths (lattice-neighbor
    pairs skipped via the packed ids) OR rest_positions (3, N) for meshes
    (pairs under rest_dist apart in the rest pose skipped; the rest
    positions ride the same multi-operand sort)."""
    assert (lattice_w is None) != (rest_positions is None), \
        "pass exactly one of lattice_w / rest_positions"
    n = P.shape[1]
    cell = jnp.clip(
        jnp.floor(P / rest_dist).astype(jnp.int32) + 512, 0, 1023)
    keys = jnp.where(active, morton_code(cell), INT32_BIG)
    immobile = w <= 0
    mesh = rest_positions is not None
    if mesh:
        from flingbot_tpu.engine.pallas_kernels import (
            PACK_IMMOBILE_BIT, PACK_INACTIVE_BIT)

        assert n < (1 << PACK_IMMOBILE_BIT), \
            "mesh packed ids support < 2^20 particles"
        packed = (jnp.arange(n, dtype=jnp.int32)
                  | (immobile.astype(jnp.int32) << PACK_IMMOBILE_BIT)
                  | ((~active).astype(jnp.int32) << PACK_INACTIVE_BIT))
        operands = (keys, P[0], P[1], P[2], prev[0], prev[1], prev[2],
                    packed, rest_positions[0], rest_positions[1],
                    rest_positions[2])
        (_, xs, ys, zs, pxs, pys, pzs, pk, rx0, ry0, rz0) = jax.lax.sort(
            operands, dimension=0, num_keys=1)
        rest_sorted = jnp.stack([rx0, ry0, rz0])
    else:
        packed = pack_lattice_ids(n, lattice_w, active, immobile)
        _, xs, ys, zs, pxs, pys, pzs, pk = jax.lax.sort(
            (keys, P[0], P[1], P[2], prev[0], prev[1], prev[2], packed),
            dimension=0, num_keys=1)
        rest_sorted = None

    if backend == "pallas":
        from flingbot_tpu.engine.pallas_kernels import (
            CONTACT_PARAM_LEN, pallas_contacts)

        R = 16
        C = -(-n // R)
        pad = R * C - n
        arrays = [xs, ys, zs, pxs, pys, pzs]
        if mesh:
            arrays += [rest_sorted[0], rest_sorted[1], rest_sorted[2]]
        if pad:
            fill = jnp.full(pad, jnp.int32(1 << 21))
            pk_p = jnp.concatenate([pk, fill])
            zf = jnp.zeros(pad, xs.dtype)
            arrays = [jnp.concatenate([a, zf]) for a in arrays]
        else:
            pk_p = pk
        pv = jnp.stack([
            jnp.asarray(rest_dist, jnp.float32),
            jnp.float32(1.0),  # uniform w scale (ratios only)
            params.particle_friction * params.dynamic_friction,
            params.dynamic_friction,
            params.collision_distance,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        ])
        shaped = [a.reshape(R, C)[None] for a in arrays]
        ox, oy, oz = pallas_contacts(
            pv[None], *shaped[:6], pk_p.reshape(R, C)[None],
            rests=(shaped[6:9] if mesh else None),
            window=window, iterations=iterations, interpret=interpret)
        ox = ox[0].reshape(-1)[:n]
        oy = oy[0].reshape(-1)[:n]
        oz = oz[0].reshape(-1)[:n]
    else:
        ox, oy, oz = _contacts_sorted_flat(
            params, rest_dist, xs, ys, zs, pxs, pys, pzs, pk,
            window=window, iterations=iterations, rest=rest_sorted)

    if mesh:
        from flingbot_tpu.engine.pallas_kernels import PACK_IMMOBILE_BIT

        key_inv = pk & ((1 << PACK_IMMOBILE_BIT) - 1)
    else:
        key_inv = ((pk >> 8) & 0xFFF) * lattice_w + (pk & 0xFF)
    _, rx, ry, rz = jax.lax.sort((key_inv, ox, oy, oz), dimension=0,
                                 num_keys=1)
    return jnp.stack([rx, ry, rz])


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

    # static pair data per k (independent of the iterating positions):
    # validity masks, neighbor inverse masses, and the per-substep constant
    # part of the pair's relative motion (prev_s - roll(prev_s)) — so the
    # inner loop spends exactly 3 rolls (of Ps) per window offset.
    ks = list(range(1, window + 1)) + list(range(-window, 0))
    pair_static, wn_k, dprev_k = [], [], []
    for k in ks:
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
        wn_k.append(jnp.roll(ws, -k))
        dprev_k.append(prev_s - jnp.roll(prev_s, -k, axis=1))

    def one_iter(_, Ps):
        delta = jnp.zeros_like(Ps)
        count = jnp.zeros(n, Ps.dtype)
        for i, k in enumerate(ks):
            Pn = jnp.roll(Ps, -k, axis=1)
            wn = wn_k[i]
            d = Ps - Pn
            dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + _EPS)
            pen = rest_dist - dist
            wsum = ws + wn
            ok = pair_static[i] & (pen > 0) & (wsum > 0)
            s = jnp.where(ok, pen / ((wsum + _EPS) * dist), 0.0)
            delta = delta + (ws * s)[None] * d
            count = count + ok
            # particle Coulomb friction on the pair's tangential motion:
            # rel = (Ps - prev_s) - roll(Ps - prev_s) = d - dprev_k
            rel = d - dprev_k[i]
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


# --------------------------------------------------------------------------
# block all-pairs contacts (the production path)
# --------------------------------------------------------------------------
#
# The roll-based sweep above spends most of its time in lane-rotate
# relayouts (20+ rolls per iteration).  This formulation reshapes the
# Morton-sorted order into overlapping blocks of 32 consecutive particles
# laid out on the SUBLANE axis — (3, 32, M) with the M blocks in lanes —
# and solves all 32x32 pairs per block by broadcasting.  Every sorted-order
# pair within distance 16 is covered (up to 31 opportunistically), the
# inner loop is pure elementwise math over fully-utilized (32, M) tiles,
# and the only relayouts are one transpose per substep and one lane-roll
# per iteration.

BLOCK_HALF = 16
BLOCK = 2 * BLOCK_HALF


def _to_half_blocks(x):
    """(..., N) -> (..., 16, M): element 16*m + r at [..., r, m]."""
    M = x.shape[-1] // BLOCK_HALF
    y = x.reshape(x.shape[:-1] + (M, BLOCK_HALF))
    return jnp.swapaxes(y, -1, -2)


def _from_half_blocks(y):
    """Inverse of _to_half_blocks."""
    z = jnp.swapaxes(y, -1, -2)
    return z.reshape(z.shape[:-2] + (-1,))


def _extend(y):
    """(..., 16, M) -> (..., 32, M): rows 16..31 of block m are rows 0..15
    of block m+1 (garbage in the last block, masked by callers)."""
    return jnp.concatenate([y, jnp.roll(y, -1, axis=-1)], axis=-2)


def _fold(d):
    """(..., 32, M) contributions -> (..., 16, M): the second-half rows
    belong to block m+1's elements."""
    first = d[..., :BLOCK_HALF, :]
    second = jnp.roll(d[..., BLOCK_HALF:, :], 1, axis=-1)
    return first + second


class BlockContactContext:
    """Per-step constants of the block contact solver, built once per
    step() call and reused by every substep's projection."""

    def __init__(self, perm, inv_perm, wf, participate, moving, params,
                 rest_dist, lattice_w=None, rest_sorted=None):
        n = wf.shape[0]
        assert n % BLOCK_HALF == 0, \
            "particle capacity must be a multiple of 16"
        self.perm = perm
        self.inv_perm = inv_perm
        self.rest_dist = rest_dist
        self.mu_p = params.particle_friction * params.dynamic_friction
        self.dynamic_friction = params.dynamic_friction
        self.collision_distance = params.collision_distance
        M = n // BLOCK_HALF
        self.ws_ext = _extend(_to_half_blocks(wf[perm]))
        self.ms_half = _to_half_blocks(moving.reshape(-1)[perm])
        act_ext = _extend(_to_half_blocks(participate[perm]))
        col = jnp.arange(M)
        last_col_ok = (col < M - 1)[None, :]
        row_ok = act_ext & (
            (jnp.arange(BLOCK)[:, None] < BLOCK_HALF) | last_col_ok)

        ids_ext = _extend(_to_half_blocks(perm))
        if lattice_w is not None:
            ids_y = ids_ext // lattice_w
            ids_x = ids_ext % lattice_w
        if rest_sorted is not None:
            rest_ext = _extend(_to_half_blocks(rest_sorted))
        static_ok = []
        for a in range(BLOCK):
            ok = row_ok & row_ok[a][None, :]
            b_idx = jnp.arange(BLOCK)[:, None]
            ok = ok & (b_idx != a)
            if a >= BLOCK_HALF:  # skip pairs living entirely in the overlap
                ok = ok & (b_idx < BLOCK_HALF)
            if lattice_w is not None:
                ok = ok & ~((jnp.abs(ids_y - ids_y[a][None]) <= 1)
                            & (jnp.abs(ids_x - ids_x[a][None]) <= 1))
            if rest_sorted is not None:
                rd0 = rest_ext[0, a][None] - rest_ext[0]
                rd1 = rest_ext[1, a][None] - rest_ext[1]
                rd2 = rest_ext[2, a][None] - rest_ext[2]
                ok = ok & (rd0 * rd0 + rd1 * rd1 + rd2 * rd2
                           >= rest_dist * rest_dist)
            static_ok.append(ok)
        self.static_ok = static_ok


def solve_contacts_block(
    P, w, moving_mask, perm, inv_perm, params, *, rest_dist,
    iterations: int = 8, lattice_w=None, rest_sorted=None, active=None,
    prev=None, ctx: "BlockContactContext | None" = None,
):
    """Iterated all-pairs-in-block contact projection + ground plane, with
    PBD Coulomb particle friction.  Same contract as solve_contacts_sweep;
    effective sorted-order window 16-31 instead of +-window.  Pass a
    prebuilt `ctx` to amortize the static setup over the whole step."""
    shape = P.shape
    Pf = P.reshape(3, -1)
    mf = moving_mask.reshape(-1)
    if ctx is None:
        ctx = BlockContactContext(
            perm, inv_perm, w.reshape(-1),
            (mf if active is None else active.reshape(-1)), moving_mask,
            params, rest_dist, lattice_w=lattice_w, rest_sorted=rest_sorted)

    rest_d = ctx.rest_dist
    mu_p = ctx.mu_p
    ws_ext = ctx.ws_ext
    ms_half = ctx.ms_half
    static_ok = ctx.static_ok

    Y0 = _to_half_blocks(Pf[:, ctx.perm])  # (3, 16, M)
    prev_half = (_to_half_blocks(prev.reshape(3, -1)[:, ctx.perm])
                 if prev is not None else Y0)
    prev_ext = _extend(prev_half)

    def one_iter(_, Y):
        Yx = _extend(Y)  # (3, 32, M)
        Dx = Yx - prev_ext
        deltas = []
        counts = []
        for a in range(BLOCK):
            d0 = Yx[0, a][None] - Yx[0]  # (32, M)
            d1 = Yx[1, a][None] - Yx[1]
            d2 = Yx[2, a][None] - Yx[2]
            dist2 = d0 * d0 + d1 * d1 + d2 * d2
            dist = jnp.sqrt(dist2 + _EPS)
            pen = rest_d - dist
            wsum = ws_ext[a][None] + ws_ext
            ok = static_ok[a] & (pen > 0) & (wsum > 0)
            s = jnp.where(ok, pen / ((wsum + _EPS) * dist), 0.0)
            wa_s = ws_ext[a][None] * s
            # friction: tangential part of the pair's motion this substep
            r0 = Dx[0, a][None] - Dx[0]
            r1 = Dx[1, a][None] - Dx[1]
            r2 = Dx[2, a][None] - Dx[2]
            inv_d = 1.0 / dist
            rel_n = (r0 * d0 + r1 * d1 + r2 * d2) * inv_d * inv_d
            t0 = r0 - rel_n * d0
            t1 = r1 - rel_n * d1
            t2 = r2 - rel_n * d2
            t_norm = jnp.sqrt(t0 * t0 + t1 * t1 + t2 * t2 + _EPS)
            fr = jnp.minimum(1.0, mu_p * pen / t_norm)
            fsc = jnp.where(ok, (ws_ext[a][None] / (wsum + _EPS)) * fr, 0.0)
            da0 = jnp.sum(wa_s * d0 - fsc * t0, axis=0)  # (M,)
            da1 = jnp.sum(wa_s * d1 - fsc * t1, axis=0)
            da2 = jnp.sum(wa_s * d2 - fsc * t2, axis=0)
            deltas.append(jnp.stack([da0, da1, da2]))
            counts.append(jnp.sum(ok, axis=0))
        delta = jnp.stack(deltas, axis=1)  # (3, 32, M)
        count = jnp.stack(counts, axis=0).astype(Y.dtype)  # (32, M)
        delta = _fold(delta)
        count = _fold(count[None])[0]
        Y = Y + jnp.where(
            ms_half[None], delta / jnp.maximum(count, 1.0)[None], 0.0)
        # ground plane in block layout
        y = Y[1]
        pen = ctx.collision_distance - y
        contact = (pen > 0) & ms_half
        dy_ = jnp.where(contact, pen, 0.0)
        dx_ = Y[0] - prev_half[0]
        dz_ = Y[2] - prev_half[2]
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        scale = jnp.minimum(
            1.0, ctx.dynamic_friction * jnp.maximum(pen, 0.0) / t_norm)
        f = jnp.where(contact, scale, 0.0)
        return jnp.stack([Y[0] - dx_ * f, Y[1] + dy_, Y[2] - dz_ * f])

    Y = jax.lax.fori_loop(0, iterations, one_iter, Y0)
    Ps = _from_half_blocks(Y)
    Pf = jnp.where(mf[None], Ps[:, ctx.inv_perm], Pf)
    return Pf.reshape(shape)
