"""XPBD cloth solver — the TPU-native replacement for the NvFlex binary.

The reference's physics tick is ``NvFlexUpdateSolver(dt=1/100, substeps=4)``
with 30 constraint iterations per substep (reference:
PyFlex/bindings/main.cpp:2273, softgym_scenes/softgym_cloth.h:154-155), whose
internal pipeline is only observable through its stage timers (predict, grid
build, collide, solveSprings, solveContacts, applyDeltas, finalize;
reference: PyFlex/include/NvFlex.h:197-223).  This module implements that
contract natively for TPU:

- **Grid cloths** (the training distribution) use a *stencil* spring solve:
  the six spring classes of CreateSpringGrid (helpers.h:872-925) become
  shifted-array arithmetic over the cloth lattice — no gathers, no
  scatters, pure VPU work, trivially vmappable over envs.  Within each class
  the constraints split into two independent sets (graph coloring), so the
  solve is Gauss-Seidel quality at Jacobi cost.
- **Mesh cloths** (shirts) use a gather + segment-sum Jacobi solve with
  local relaxation (delta / constraint-degree), matching the documented
  ``eNvFlexRelaxationLocal`` semantics (NvFlex.h:89,152-153).
- Self-collision uses a hash-grid neighbor search (sort + 27-cell lookup)
  rebuilt once per step, with the rest-pose filter of
  ``eNvFlexPhaseSelfCollideFilter`` (NvFlex.h:166).

Layout: ALL hot arrays are component-leading SoA — positions as (3, H, W)
lattices or (3, N) — so the TPU lane dimension is the particle axis
(W or N, ~100-10k wide), never the xyz axis of size 3.  The canonical
ClothState keeps the pyflex-compatible (N, 3) layout; transposes happen
once per step() call, not per substep.

Everything is fixed-shape and dispatches under ``jit``/``vmap``; there is no
data-dependent Python control flow.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.engine.topology import (
    GRID_STENCIL_CLASSES,
    GridTopology,
    LayeredGridTopology,
    MeshTopology,
)
from flingbot_tpu.engine import collisions

_EPS = 1e-9


# --------------------------------------------------------------------------
# small shifted-array helpers (no wraparound — pads with `fill`)
# --------------------------------------------------------------------------

def shift2d(a: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """out[..., y, x] = a[..., y + dy, x + dx], out-of-range -> fill.

    Operates on the LAST two axes; leading axes (components, batch) ride
    along."""
    H, W = a.shape[-2], a.shape[-1]
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    pads = ((0, 0),) * (a.ndim - 2) + (pad_y, pad_x)
    ap = jnp.pad(a, pads, constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(ap, pad_y[0] + dy, H, axis=-2),
        pad_x[0] + dx,
        W,
        axis=-1,
    )


def _norm3(d):
    """(3, ...) -> (...) euclidean norm (cheap leading-axis reduce)."""
    return jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + _EPS)


# --------------------------------------------------------------------------
# grid lattice <-> canonical flat layout
# --------------------------------------------------------------------------

def _lattice_indices(topo: GridTopology):
    """(H, W) canonical flat index (y * dimx + x) and validity mask."""
    H, W = topo.max_dimy, topo.max_dimx
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = (iy < topo.dimy) & (ix < topo.dimx)
    flat = jnp.where(valid, iy * topo.dimx + ix, 0)
    return flat, valid


def gather_to_lattice(x: jnp.ndarray, topo: GridTopology, fill=0.0):
    """Canonical (N,) -> (H, W)   or   (N, 3) -> (3, H, W)."""
    H, W = topo.max_dimy, topo.max_dimx
    if topo.full_grid:
        # canonical flat index == lattice index: pure reshape/transpose
        valid = jnp.ones((H, W), bool)
        if x.ndim == 1:
            return x.reshape(H, W), valid
        return jnp.moveaxis(x.reshape(H, W, 3), -1, 0), valid
    flat, valid = _lattice_indices(topo)
    if x.ndim == 1:
        out = x[flat]
        return jnp.where(valid, out, fill), valid
    out = x[flat]  # (H, W, 3)
    out = jnp.where(valid[..., None], out, fill)
    return jnp.moveaxis(out, -1, 0), valid  # (3, H, W)


def scatter_from_lattice(
    lattice: jnp.ndarray, x: jnp.ndarray, topo: GridTopology
) -> jnp.ndarray:
    """Lattice (3, H, W) -> canonical (N, 3), untouched where padded.

    Formulated as a GATHER from the canonical side (canonical slot i lives
    at lattice [i // dimx, i % dimx]) — value-identical to the old
    `.at[tgt].set` scatter but TPU-fast: gathers cost ~ns/element while
    scatter lowering serializes (the round-4 mesh-path lesson).  This
    conversion runs once per solver step per env on every non-full-grid
    cloth, so it is hot-path for the whole training distribution
    (dimx 64-104 padded to 104)."""
    if topo.full_grid:
        return jnp.moveaxis(lattice, 0, -1).reshape(-1, lattice.shape[0])
    N = x.shape[0]
    W = topo.max_dimx
    i = jnp.arange(N, dtype=jnp.int32)
    iy = i // topo.dimx
    ix = i % topo.dimx
    inb = i < topo.dimx * topo.dimy
    iy = jnp.where(inb, jnp.minimum(iy, topo.max_dimy - 1), 0)
    ix = jnp.where(inb, ix, 0)
    vals = lattice[:, iy, ix]  # (3, N) gather
    return jnp.where(inb[:, None], vals.T, x)


# --------------------------------------------------------------------------
# spring solves (P is SoA: (3, H, W) grid / (3, N) mesh)
# --------------------------------------------------------------------------

def _grid_phase(P, w, valid, dy, dx, color, rest, stiff, relax):
    """One colored Gauss-Seidel phase of one stencil class.

    Projects every constraint {(y,x), (y+dy, x+dx)} whose start parity
    matches `color`; within a phase no particle is touched twice, so the
    two endpoint updates can be applied as plain masked adds."""
    H, W = P.shape[-2], P.shape[-1]
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    if (dy, dx) == (0, 1):
        sel = (ix % 2) == color
    elif (dy, dx) == (1, 0):
        sel = (iy % 2) == color
    elif (dy, dx) == (0, 2):
        sel = ((ix // 2) % 2) == color
    elif (dy, dx) == (2, 0):
        sel = ((iy // 2) % 2) == color
    else:  # diagonals (1, 1) and (1, -1)
        sel = (iy % 2) == color

    Pb = shift2d(P, dy, dx)
    wb = shift2d(w, dy, dx)
    pair_ok = sel & valid & shift2d(valid, dy, dx, fill=False)

    d = Pb - P  # (3, H, W)
    dist = _norm3(d)
    C = dist - rest
    wsum = w + wb
    s = jnp.where(pair_ok & (wsum > 0),
                  relax * stiff * C / ((wsum + _EPS) * dist), 0.0)
    dA = (w * s)[None] * d
    dB = (-(wb * s))[None] * d
    return P + dA + shift2d(dB, -dy, -dx)


def _grid_jacobi(P, w, valid, topo: GridTopology, relax):
    """All six stencil classes from the same P, accumulated and divided by
    per-particle constraint count — NvFlex's eNvFlexRelaxationLocal
    (NvFlex.h:89,152-153)."""
    acc = jnp.zeros_like(P)
    count = jnp.zeros(P.shape[-2:], P.dtype)
    for dy, dx, rest_k, cls in GRID_STENCIL_CLASSES:
        rest = rest_k * topo.spacing
        stiff = topo.stiffness[cls]
        Pb = shift2d(P, dy, dx)
        wb = shift2d(w, dy, dx)
        pair_ok = valid & shift2d(valid, dy, dx, fill=False)
        d = Pb - P
        dist = _norm3(d)
        C = dist - rest
        wsum = w + wb
        s = jnp.where(pair_ok & (wsum > 0),
                      stiff * C / ((wsum + _EPS) * dist), 0.0)
        dA = (w * s)[None] * d
        dB = (-(wb * s))[None] * d
        acc = acc + dA + shift2d(dB, -dy, -dx)
        cnt = pair_ok.astype(P.dtype)
        count = count + cnt + shift2d(cnt, -dy, -dx)
    return P + relax * acc / jnp.maximum(count, 1.0)[None]


def solve_springs_grid(P, w, valid, topo: GridTopology, relax, mode: str):
    if mode in ("jacobi", "chebyshev"):
        # "chebyshev" uses the same Jacobi iterate; the acceleration wraps
        # the iteration loop (_chebyshev_loop in _substep).
        return _grid_jacobi(P, w, valid, topo, relax)
    for dy, dx, rest_k, cls in GRID_STENCIL_CLASSES:
        rest = rest_k * topo.spacing
        stiff = topo.stiffness[cls]
        for color in (0, 1):
            P = _grid_phase(P, w, valid, dy, dx, color, rest, stiff, relax)
    return P


CHEBYSHEV_RHO = 0.992  # spectral-radius estimate (Wang 2015 suggests ~0.99)
CHEBYSHEV_DELAY = 2  # plain Jacobi warm-up iterations
# under-relaxation of the accelerated update (gamma in Wang 2015 eq. 14).
# Full-strength Chebyshev without the maxAcceleration clamp is unstable
# under fling-speed picker drags (measured: heuristic eval coverage 0.07
# vs 0.54); WITH the clamp (solver finalize, NvFlexParams.maxAcceleration)
# gamma=1.0 evaluates at GS-parity fling quality (0.51 vs 0.54 +- 0.05)
# while keeping GS-parity static stiffness (hanging stretch 1.613 vs
# 1.605).  Keep the knob for experiments.
CHEBYSHEV_GAMMA = 1.0


def _chebyshev_loop(P, iterate_fn, iterations: int, plane_fn,
                    rho=CHEBYSHEV_RHO):
    """Chebyshev semi-iterative acceleration of a Jacobi-style iteration
    (Descent/Chebyshev PBD, Wang 2015): matches FleX's Jacobi + local
    relaxation semantics (eNvFlexRelaxationLocal, NvFlex.h:89,152-153) but
    converges like Gauss-Seidel.

        P_{k+1} = plane( omega_k * (iterate(P_k) - P_{k-1}) + P_{k-1} )

    The plane projection runs AFTER the extrapolation so the accelerated
    iterate stays feasible.  Mirrors _substeps_kernel's loop exactly (the
    pallas backend is cross-checked against this path in tests).  `rho`
    may be a traced scalar (SolverParams.chebyshev_rho) — sweeps
    recompile nothing."""
    rho2 = rho * rho
    gamma = CHEBYSHEV_GAMMA

    def damp(P_next, P):
        # gamma == 1.0 fast path: 1*(Pn-P)+P is NOT compiler-foldable to
        # Pn in floats; skip the two vector ops (mirrors _substeps_kernel)
        if gamma == 1.0:
            return P_next
        return gamma * (P_next - P) + P

    # warm-up (plain Jacobi) and the first accelerated iteration peeled
    # out of the fori_loop — drops the per-iteration k<DELAY selects
    P_prev = P
    for _ in range(min(CHEBYSHEV_DELAY, iterations)):
        P_prev, P = P, plane_fn(iterate_fn(P))
    if iterations <= CHEBYSHEV_DELAY:
        return P
    omega0 = 2.0 / (2.0 - rho2)
    P_acc = omega0 * (damp(iterate_fn(P), P) - P_prev) + P_prev
    P_prev, P = P, plane_fn(P_acc)

    def body(_, carry):
        P, P_prev, omega = carry
        omega = 4.0 / (4.0 - rho2 * omega)
        P_acc = omega * (damp(iterate_fn(P), P) - P_prev) + P_prev
        return (plane_fn(P_acc), P, omega)

    P_out, _, _ = jax.lax.fori_loop(
        CHEBYSHEV_DELAY + 1, iterations, body,
        (P, P_prev, jnp.asarray(omega0, jnp.float32)))
    return P_out


def solve_springs_mesh(P, w, topo: MeshTopology, relax):
    """Jacobi + local relaxation, VERTEX-CENTRIC (shirt path).  P: (3, N).

    Gather-only: every vertex pulls its <= D incident neighbors through the
    topology's incidence tables and sums its own corrections — no
    scatter-add.  Identical math to the edge formulation (each edge (a,b)
    contributes w_a*s*(p_b-p_a) to a and w_b*s*(p_a-p_b) to b; here each
    endpoint computes its own term), summation order differs only within a
    vertex's slot list.  The old `.at[e0/e1].add` edge scatter measured
    250 ms/env-step on v5e (2026-08-19 mesh probe) — TPU scatter is serial;
    gathers are ~ns/element."""
    nbr = topo.nbr_idx  # (D, N)
    pn = P[:, nbr]  # (3, D, N) gather
    wn = w[nbr]  # (D, N)
    d = pn - P[:, None, :]
    dist = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2 + _EPS)
    C = dist - topo.nbr_rest
    wsum = w[None, :] + wn
    s = jnp.where(topo.nbr_mask & (wsum > 0),
                  topo.nbr_stiff * C / ((wsum + _EPS) * dist), 0.0)
    acc = ((w[None, :] * s)[None] * d).sum(axis=1)  # (3, N)
    return P + relax * acc / jnp.maximum(topo.degree, 1.0)[None]


def solve_springs_layered(P, w, topo: LayeredGridTopology, relax):
    """Jacobi + local relaxation over the layered shirt lattice.  P: (3,H,W).

    The same constraint system as solve_springs_mesh (builder-verified exact
    edge/rest/degree parity), but every class is a fixed lattice offset so
    the whole solve is shifted-array arithmetic — no gathers.  This is what
    makes shirts grid-speed on TPU (the mesh gather path measured
    118 ms/env-step at batch 16 vs 0.47 ms for the grid stencil)."""
    acc = jnp.zeros_like(P)
    for k, (dy, dx) in enumerate(topo.offsets):
        stiff = topo.stiff[k]
        Pb = shift2d(P, dy, dx)
        wb = shift2d(w, dy, dx)
        d = Pb - P
        dist = _norm3(d)
        C = dist - topo.rest[k]
        wsum = w + wb
        s = jnp.where((stiff > 0) & (wsum > 0),
                      stiff * C / ((wsum + _EPS) * dist), 0.0)
        dA = (w * s)[None] * d
        dB = (-(wb * s))[None] * d
        acc = acc + dA + shift2d(dB, -dy, -dx)
    return P + relax * acc / jnp.maximum(topo.count, 1.0)[None]


# --------------------------------------------------------------------------
# contacts: ground plane, picker spheres (P is (3, ...))
# --------------------------------------------------------------------------

def solve_plane(P, prev, params: SolverParams, moving_mask):
    """Ground plane y >= collision_distance with PBD Coulomb friction
    (NvFlexParams.dynamicFriction semantics, NvFlex.h:105; plane contact at
    collisionDistance, NvFlex.h:145)."""
    y = P[1]
    pen = params.collision_distance - y
    contact = (pen > 0) & moving_mask
    dy = jnp.where(contact, pen, 0.0)
    dx_ = P[0] - prev[0]
    dz_ = P[2] - prev[2]
    t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
    scale = jnp.minimum(
        1.0, params.dynamic_friction * jnp.maximum(pen, 0.0) / t_norm)
    f = jnp.where(contact, scale, 0.0)
    return jnp.stack([P[0] - dx_ * f, P[1] + dy, P[2] - dz_ * f])


def solve_picker_spheres(P, picker_pos, picker_radius, params: SolverParams,
                         moving_mask, prev=None):
    """Push particles out of the gripper spheres.  The reference adds the
    pickers as FleX sphere shapes (flex_utils.py:83, pyflex.add_sphere),
    which FleX also gives shape friction (dynamicFriction=0.75,
    softgym_cloth.h:164; particleFriction=1.0 :165 is particle-particle).

    DOCUMENTED DEVIATION (VERDICT r3 weak #7): production runs the push-out
    only (params.picker_friction = 0) on BOTH backends, so pallas/XLA stay
    numerically identical.  The Coulomb term below (same PBD model as
    solve_plane: tangential slip removed up to mu*penetration, against the
    quasi-static sphere) was A/B-measured on a full scripted
    pick-stretch-fling (CPU/XLA, chebyshev 16, mu=0 vs the scene's 0.75):
    64x64/0.5 kg cloth -> final coverage +2.6% relative, max particle
    displacement 0.027 m; 16x16 toy cloth -> large (the sphere is huge
    relative to a 9 cm cloth).  Small but nonzero; the policy trains
    self-supervised in THIS sim, so the deviation shifts the physics
    without breaking the capability contract.  Enabling it in production
    would require the friction term inside pallas_substeps' per-substep
    picker push too (the kernel is position-only) — deferred until a QA'd
    TPU revalidation window.  picker_friction>0 is exercised on the
    XLA path (prev threaded from each substep entry); see
    tests/test_solver.py::TestPickerFriction."""
    R = picker_radius + params.collision_distance
    shape = P.shape[1:]
    mu = getattr(params, "picker_friction", 0.0)
    delta = jnp.zeros_like(P)
    for k in range(picker_pos.shape[0]):
        c = picker_pos[k]
        d = P - c.reshape((3,) + (1,) * len(shape))
        dist = _norm3(d)
        pen = R - dist
        contact = (pen > 0) & moving_mask
        push = jnp.where(contact, pen / dist, 0.0)
        delta = delta + d * push[None]
        if prev is not None:
            slip = P - prev
            n = d / dist[None]
            t = slip - (slip * n).sum(axis=0)[None] * n
            t_norm = jnp.sqrt(t[0] ** 2 + t[1] ** 2 + t[2] ** 2 + _EPS)
            scale = jnp.minimum(1.0, mu * jnp.maximum(pen, 0.0) / t_norm)
            delta = delta - t * jnp.where(contact, scale, 0.0)[None]
    return P + delta


# --------------------------------------------------------------------------
# the step
# --------------------------------------------------------------------------

def _substep(P, V, w, moving_mask, params, dt, iterations, solve_fn,
             contact_fn, normals_fn=None, chebyshev=False):
    """One XPBD substep: predict -> iterate constraints -> finalize.
    P, V: (3, ...); w, moving_mask: (...)."""
    g = params.gravity.reshape((3,) + (1,) * (P.ndim - 1))
    mm = moving_mask[None]
    V = V + dt * g
    if normals_fn is not None:  # aero (NvFlex drag/lift/wind, NvFlex.h:120-122)
        from flingbot_tpu.engine.aero import aero_accel

        V = V + dt * aero_accel(V, normals_fn(P), params, moving_mask)
    V = V * jnp.maximum(0.0, 1.0 - params.damping * dt)
    V = jnp.where(mm, V, 0.0)
    prev = P
    P = jnp.where(mm, P + dt * V, P)

    if chebyshev:
        P = _chebyshev_loop(
            P, solve_fn, iterations,
            lambda Q: solve_plane(Q, prev, params, moving_mask),
            rho=getattr(params, "chebyshev_rho", CHEBYSHEV_RHO))
    else:
        def body(_, P):
            P = solve_fn(P)
            P = solve_plane(P, prev, params, moving_mask)
            return P

        P = jax.lax.fori_loop(0, iterations, body, P, unroll=False)
    # acceleration clamp (NvFlexParams.maxAcceleration, main.cpp:786):
    # caps the velocity change the SPRING solve can inject in one substep —
    # the stabilizer against Chebyshev overshoot (without it fling-speed
    # drags scramble the cloth; round-2 eval coverage 0.07 vs 0.54).
    # Deliberate deviation from FleX's blanket end-of-step clamp, derived
    # from the round-3 crumple A/B (STATUS.md): only SPEED-INCREASING
    # changes are clamped.  Decelerations are real physics — floor and pile
    # impacts must stop the cloth dead or dropped cloth spreads flat
    # instead of crumpling (blanket clamp: init/flatten 0.605; decel-exempt
    # variants: 0.48-0.60; reference grade is ~0.33) — while solver energy
    # injection (Chebyshev overshoot, deep-penetration ejection) always
    # shows up as a speed-up.  The self-collision delta below is clamped by
    # the same criterion.
    V_new = (P - prev) / dt
    dv = V_new - V
    dv_norm = jnp.sqrt(dv[0] ** 2 + dv[1] ** 2 + dv[2] ** 2 + _EPS)
    dv_max = params.max_acceleration * dt
    speeding = (V_new[0] ** 2 + V_new[1] ** 2 + V_new[2] ** 2
                > V[0] ** 2 + V[1] ** 2 + V[2] ** 2)
    scale = jnp.where(speeding, jnp.minimum(1.0, dv_max / dv_norm), 1.0)
    V = jnp.where(mm, V + dv * scale[None], V)
    # self-collision once per substep from the per-step neighbor structure;
    # its velocity contribution gets the same speed-up-only clamp (catches
    # deep-penetration ejection pops without damping pile impacts)
    if contact_fn is not None:
        P2 = contact_fn(P, prev)
        P2 = solve_plane(P2, prev, params, moving_mask)
        P, V = _add_delta_clamped(P, P2, V, dt, dv_max, mm)
    return P, V


def _add_delta_clamped(P, P2, V, dt, dv_max, mm):
    """Apply a position projection P->P2 with its velocity contribution
    clamped by the speed-up-only maxAcceleration criterion (see the clamp
    note in _substep)."""
    dv = (P2 - P) / dt
    V_new = V + dv
    dv_norm = jnp.sqrt(dv[0] ** 2 + dv[1] ** 2 + dv[2] ** 2 + _EPS)
    speeding = (V_new[0] ** 2 + V_new[1] ** 2 + V_new[2] ** 2
                > V[0] ** 2 + V[1] ** 2 + V[2] ** 2)
    scale = jnp.where(speeding, jnp.minimum(1.0, dv_max / dv_norm), 1.0)
    V = jnp.where(mm, V + dv * scale[None], V)
    return P2, V


def _run_substeps(P, V, w, moving_mask, params, substeps, iterations,
                  solve_fn, contact_fn, picker_pos, picker_radius,
                  normals_fn=None, contact_every=1, chebyshev=False):
    dt = params.dt / substeps

    def one(i, carry):
        P, V = carry
        P_in = P  # substep-entry positions (friction slip reference)
        cf = contact_fn
        if contact_fn is not None and contact_every > 1:
            # contacts at the END of each contact_every group (i.e. after
            # substeps 2, 4, ... for contact_every=2) — same schedule as
            # the pallas pipeline in _step_grid_pallas
            cf = lambda Px, prev: jax.lax.cond(
                (i + 1) % contact_every == 0, contact_fn,
                lambda q, _p: q, Px, prev)
        P, V = _substep(P, V, w, moving_mask, params, dt, iterations,
                        solve_fn, cf, normals_fn, chebyshev)
        P = solve_picker_spheres(P, picker_pos, picker_radius, params,
                                 moving_mask, prev=P_in)
        return (P, V)

    P, V = jax.lax.fori_loop(0, substeps, one, (P, V))
    return P, V


def step(
    state: ClothState,
    topo,
    params: SolverParams,
    *,
    substeps: int = 4,
    iterations: int = 30,
    self_collision: bool = True,
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_iterations: int = 8,
    contact_every: int = 1,
    resort_interval: int = 4,
    picker_radius: float = 0.02,
    backend: str = "xla",
    pallas_interpret: bool = False,
    aero: bool = False,
    contact_window: int = 16,
) -> ClothState:
    """Advance the world by one frame: dt split into `substeps` XPBD substeps
    of `iterations` constraint projections each — the TPU analog of
    NvFlexUpdateSolver(g_dt, g_numSubsteps) (main.cpp:2273).

    contact_mode (XLA backend): 'sort' (fresh Morton sort + windowed pair
    sweep per contact pass — mirrors the pallas production path), 'sweep' /
    'block' (cached-permutation round-1 paths) or 'table' (exact hash-grid
    neighbor table — gather-bound, for verification).  backend: 'xla' or
    'pallas' (grid cloths: the fused substeps kernel + sorted contact
    kernel in pallas_kernels.py; spring_mode 'gs' maps to the
    Chebyshev-Jacobi solve there)."""
    if backend == "pallas" and not pallas_interpret \
            and jax.default_backend() == "cpu":
        # Mosaic kernels only compile for TPU; on CPU (tests, dev boxes)
        # fall back to interpret mode so the production default config
        # still runs everywhere.
        pallas_interpret = True
    if isinstance(topo, GridTopology):
        return _step_grid(
            state, topo, params, substeps, iterations, self_collision,
            spring_mode, contact_mode, contact_iterations, contact_every,
            resort_interval, picker_radius, backend, pallas_interpret, aero,
            contact_window,
        )
    if isinstance(topo, LayeredGridTopology):
        return _step_layered(
            state, topo, params, substeps, iterations, self_collision,
            spring_mode, contact_mode, contact_iterations, contact_every,
            picker_radius, backend, pallas_interpret, aero, contact_window,
        )
    return _step_mesh(
        state, topo, params, substeps, iterations, self_collision,
        spring_mode, contact_mode, contact_iterations, contact_every,
        resort_interval, picker_radius, backend, pallas_interpret,
        contact_window, aero,
    )




def _cached_sweep_order(state, flatP, participate, radius, resort_interval):
    """Morton ordering, re-sorted every `resort_interval` steps.

    The argsort is the expensive part of self-collision (a bitonic sort of
    ~10k keys per env); particles move ~1e-3 m/step against a 0.011 m cell,
    so a slightly stale ordering costs nothing — the sweep window absorbs
    it.  The cached permutation lives in ClothState."""
    need = (state.step_count % resort_interval) == 0

    def compute(_):
        return collisions.sweep_order(flatP, participate, radius)

    def cached(_):
        return state.sweep_perm, state.sweep_inv

    return jax.lax.cond(need, compute, cached, None)


def _step_grid_pallas(Pl, Vl, wl, valid, moving, state, topo, params,
                      substeps, iterations, self_collision, spring_mode,
                      contact_every, contact_window, contact_iterations,
                      picker_radius, interpret, aero=False):
    """Round-2 fused pipeline: `pallas_substeps` launches (contact_every
    substeps per launch: integrate + Chebyshev-Jacobi springs + ground
    plane + velocity finalize + picker spheres, all VMEM-resident)
    interleaved with sort-based contact groups (collisions.contact_group ->
    pallas_contacts kernel + two multi-operand lax.sorts).

    Implements the NvFlexUpdateSolver substep pipeline (NvFlex.h:197-223)
    with self-collision solved once per `contact_every` substeps.  The
    contact-substep ordering matches solver._substep EXACTLY: springs ->
    clamped velocity finalize (speed-up-only clamp, spring phase) ->
    contacts -> plane -> velocity add under the SAME speed-up-only clamp
    (_add_delta_clamped) -> picker spheres position-only (the kernel
    defers the last substep's picker via picker_last=False)."""
    from flingbot_tpu.engine.pallas_kernels import (
        pack_sub_params, pallas_substeps)

    H, W = topo.max_dimy, topo.max_dimx
    dt_sub = params.dt / substeps
    cheb = spring_mode != "jacobi"  # "gs"/"chebyshev" -> accelerated Jacobi
    pvec = pack_sub_params(params, topo, state.picker_pos, picker_radius,
                           dt_sub,
                           getattr(params, "chebyshev_rho", CHEBYSHEV_RHO))
    flat_valid = valid.reshape(-1)
    mm = moving[None]

    def contacts(Pl, Vl, prevL):
        # contacts -> plane -> speed-clamped velocity add -> picker
        # (same as _substep + _run_substeps; the kernel already applied
        # the spring-phase clamp)
        P2 = collisions.contact_group(
            Pl.reshape(3, -1), prevL.reshape(3, -1), wl.reshape(-1),
            flat_valid, params, rest_dist=params.radius, lattice_w=W,
            window=contact_window, iterations=contact_iterations,
            backend="pallas", interpret=interpret,
        ).reshape(3, H, W)
        P2 = solve_plane(P2, prevL, params, moving)
        P2, Vl2 = _add_delta_clamped(
            Pl, P2, Vl, dt_sub, params.max_acceleration * dt_sub, mm)
        Pl = solve_picker_spheres(P2, state.picker_pos, picker_radius,
                                  params, moving)
        return Pl, Vl2

    if aero:
        # Aero (NvFlex drag/lift/wind, NvFlex.h:120-122) is a per-substep
        # velocity kick that depends on the cloth normals, so the fused
        # multi-substep launch can't carry it — run ONE substep per launch
        # and apply the kick between launches.  Ordering parity with
        # _substep (gravity -> aero -> damping): the kick is computed on
        # the post-gravity velocity, while the kernel itself integrates
        # gravity and damping, so the kernel's damped velocity equals
        # damp * (V + dt*g + dt*aero(V + dt*g)) exactly as the XLA path.
        # Slower than the fused launch (flingbot scenes run drag/lift/
        # wind = 0, main.cpp:753-764, and never take this branch).
        from flingbot_tpu.engine.aero import aero_accel, grid_normals

        g = params.gravity.reshape(3, 1, 1)
        for s in range(substeps):
            Vg = Vl + dt_sub * g
            Vl = Vl + dt_sub * jnp.where(
                mm, aero_accel(Vg, grid_normals(Pl, valid), params, moving),
                0.0)
            contact_now = self_collision and ((s + 1) % contact_every == 0)
            Pn, Vn, prevL = pallas_substeps(
                pvec[None], Pl[None], Vl[None], wl[None],
                n_sub=1, iterations=iterations, cheb=cheb,
                picker_last=not contact_now, interpret=interpret)
            Pl, Vl, prevL = Pn[0], Vn[0], prevL[0]
            if contact_now:
                Pl, Vl = contacts(Pl, Vl, prevL)
        return Pl, Vl

    n_sub = contact_every if self_collision else substeps
    n_groups = max(1, substeps // n_sub)
    assert n_groups * n_sub == substeps, (
        "substeps must be divisible by contact_every")

    for _ in range(n_groups):
        Pn, Vn, prevL = pallas_substeps(
            pvec[None], Pl[None], Vl[None], wl[None],
            n_sub=n_sub, iterations=iterations, cheb=cheb,
            picker_last=not self_collision, interpret=interpret)
        Pl, Vl, prevL = Pn[0], Vn[0], prevL[0]
        if self_collision:
            Pl, Vl = contacts(Pl, Vl, prevL)
    return Pl, Vl


def _step_grid(state, topo, params, substeps, iterations, self_collision,
               spring_mode, contact_mode, contact_iterations, contact_every,
               resort_interval, picker_radius,
               backend="xla", pallas_interpret=False, aero=False,
               contact_window=16):
    Pl, valid = gather_to_lattice(state.positions, topo)  # (3, H, W)
    Vl, _ = gather_to_lattice(state.velocities, topo)
    wl, _ = gather_to_lattice(state.inv_mass, topo)
    wl = jnp.where(valid, wl, 0.0)
    moving = valid & (wl > 0)

    if backend == "pallas":
        Pl, Vl = _step_grid_pallas(
            Pl, Vl, wl, valid, moving, state, topo, params, substeps,
            iterations, self_collision, spring_mode, contact_every,
            contact_window, contact_iterations, picker_radius,
            pallas_interpret, aero=aero)
        positions = scatter_from_lattice(Pl, state.positions, topo)
        velocities = scatter_from_lattice(Vl, state.velocities, topo)
        return state.replace(
            positions=positions, velocities=velocities,
            time=state.time + params.dt,
            step_count=state.step_count + 1,
        )

    contact_fn = None
    perm = inv_perm = None
    if self_collision:
        flat_moving = moving.reshape(-1)
        flat_valid = valid.reshape(-1)
        if contact_mode == "sort":
            H, W = topo.max_dimy, topo.max_dimx

            def contact_fn(P, prev):
                P2 = collisions.contact_group(
                    P.reshape(3, -1), prev.reshape(3, -1),
                    wl.reshape(-1), flat_valid, params,
                    rest_dist=params.radius, lattice_w=W,
                    window=contact_window,
                    iterations=contact_iterations, backend="xla")
                return P2.reshape(3, H, W)
        elif contact_mode in ("sweep", "block"):
            perm, inv_perm = _cached_sweep_order(
                state, Pl.reshape(3, -1), flat_valid, params.radius,
                resort_interval)
            if contact_mode == "block":
                ctx = collisions.BlockContactContext(
                    perm, inv_perm, wl.reshape(-1), flat_valid, moving,
                    params, params.radius, lattice_w=topo.max_dimx)
                contact_fn = lambda P, prev: collisions.solve_contacts_block(
                    P, wl, moving, perm, inv_perm, params,
                    rest_dist=params.radius, prev=prev,
                    iterations=contact_iterations, ctx=ctx)
            else:
                contact_fn = lambda P, prev: collisions.solve_contacts_sweep(
                    P, wl, moving, perm, inv_perm, params,
                    rest_dist=params.radius, lattice_w=topo.max_dimx,
                    active=valid, prev=prev)
        else:
            nbr_idx, nbr_mask = collisions.find_neighbors_grid(
                Pl.reshape(3, -1), flat_moving, topo.max_dimx, params.radius)
            contact_fn = lambda P, prev: collisions.solve_contacts(
                P, wl, moving, nbr_idx, nbr_mask, rest_dist=params.radius)

    solve_fn = lambda P: solve_springs_grid(
        P, wl, valid, topo, params.relaxation_factor, spring_mode
    )
    normals_fn = None
    if aero:
        from flingbot_tpu.engine.aero import grid_normals

        normals_fn = lambda P: grid_normals(P, valid)
    Pl, Vl = _run_substeps(
        Pl, Vl, wl, moving, params, substeps, iterations, solve_fn,
        contact_fn, state.picker_pos, picker_radius, normals_fn,
        contact_every, chebyshev=(spring_mode == "chebyshev"),
    )

    positions = scatter_from_lattice(Pl, state.positions, topo)
    velocities = scatter_from_lattice(Vl, state.velocities, topo)
    return state.replace(
        positions=positions, velocities=velocities,
        time=state.time + params.dt,
        step_count=state.step_count + 1,
        sweep_perm=perm if perm is not None else state.sweep_perm,
        sweep_inv=inv_perm if inv_perm is not None else state.sweep_inv,
    )


def _step_layered(state, topo, params, substeps, iterations, self_collision,
                  spring_mode, contact_mode, contact_iterations,
                  contact_every, picker_radius, backend="xla",
                  pallas_interpret=False, aero=False, contact_window=16):
    """Layered-lattice shirt step: the stencil spring solve of
    solve_springs_layered inside the same substep/Chebyshev/contact pipeline
    as the mesh path (same constraint system by builder verification, so
    identical solver semantics — only the layout changed).  Contacts reuse
    the production sort-based group on the flattened particle axis."""
    H, W = topo.H, topo.W
    P = state.positions.T.reshape(3, H, W)
    V = state.velocities.T.reshape(3, H, W)
    act2 = state.active.reshape(H, W)
    w = jnp.where(act2, state.inv_mass.reshape(H, W), 0.0)
    moving = act2 & (w > 0)

    contact_fn = None
    if self_collision:
        if contact_mode != "sort":
            raise ValueError(
                f"layered topology supports contact_mode='sort' only "
                f"(got {contact_mode!r})")
        rest_flat = topo.rest_positions.T

        def contact_fn(Px, prev):
            out = collisions.contact_group(
                Px.reshape(3, -1), prev.reshape(3, -1),
                w.reshape(-1), state.active, params,
                rest_dist=params.radius, rest_positions=rest_flat,
                window=contact_window, iterations=contact_iterations,
                backend=("pallas" if backend == "pallas" else "xla"),
                interpret=pallas_interpret)
            return out.reshape(3, H, W)

    if spring_mode not in ("gs", "chebyshev", "jacobi"):
        raise ValueError(f"unknown layered spring_mode {spring_mode!r}")
    solve_fn = lambda Px: solve_springs_layered(Px, w, topo,
                                                params.relaxation_factor)
    normals_fn = None
    if aero:  # dynamic-triangle drag/lift (NvFlex.h:120-122)
        from flingbot_tpu.engine.aero import mesh_normals

        normals_fn = lambda Px: mesh_normals(
            Px.reshape(3, -1), topo.triangles, topo.tri_mask,
            state.active).reshape(3, H, W)
    P, V = _run_substeps(
        P, V, w, moving, params, substeps, iterations, solve_fn,
        contact_fn, state.picker_pos, picker_radius, normals_fn,
        contact_every,
        chebyshev=(spring_mode in ("gs", "chebyshev")),
    )
    return state.replace(
        positions=P.reshape(3, -1).T, velocities=V.reshape(3, -1).T,
        time=state.time + params.dt,
        step_count=state.step_count + 1,
    )


def _step_mesh(state, topo, params, substeps, iterations, self_collision,
               spring_mode, contact_mode, contact_iterations, contact_every,
               resort_interval, picker_radius, backend="xla",
               pallas_interpret=False, contact_window=16, aero=False):
    """Mesh (shirt) step — solver parity with the grid path: Jacobi + local
    relaxation, optionally Chebyshev-accelerated (spring_mode "gs" and
    "chebyshev" both map to the accelerated loop; meshes have no stencil
    coloring, so plain "jacobi" is the only unaccelerated mode), and the
    same sort-based contact group (contact_mode "sort", grid's production
    path) with the rest-distance SelfCollideFilter (NvFlex.h:166)."""
    P = state.positions.T  # (3, N)
    V = state.velocities.T
    w = jnp.where(state.active, state.inv_mass, 0.0)
    moving = state.active & (w > 0)

    contact_fn = None
    perm = inv_perm = None
    if self_collision:
        if contact_mode == "sort":
            rest_flat = topo.rest_positions.T

            def contact_fn(Px, prev):
                return collisions.contact_group(
                    Px, prev, w, state.active, params,
                    rest_dist=params.radius, rest_positions=rest_flat,
                    window=contact_window, iterations=contact_iterations,
                    backend=("pallas" if backend == "pallas" else "xla"),
                    interpret=pallas_interpret)
        elif contact_mode in ("sweep", "block"):
            perm, inv_perm = _cached_sweep_order(
                state, P, state.active, params.radius, resort_interval)
            rest_sorted = topo.rest_positions.T[:, perm]
            if contact_mode == "block":
                ctx = collisions.BlockContactContext(
                    perm, inv_perm, w, state.active, moving,
                    params, params.radius, rest_sorted=rest_sorted)
                contact_fn = lambda Px, prev: collisions.solve_contacts_block(
                    Px, w, moving, perm, inv_perm, params,
                    rest_dist=params.radius, prev=prev,
                    iterations=contact_iterations, ctx=ctx)
            else:
                contact_fn = lambda Px, prev: collisions.solve_contacts_sweep(
                    Px, w, moving, perm, inv_perm, params,
                    rest_dist=params.radius, rest_sorted=rest_sorted,
                    active=state.active, prev=prev)
        elif contact_mode == "table":
            nbr_idx, nbr_mask = collisions.find_neighbors_hash(
                P, moving, params.radius, topo.rest_positions.T)
            contact_fn = lambda Px, prev: collisions.solve_contacts(
                Px, w, moving, nbr_idx, nbr_mask, rest_dist=params.radius)
        else:
            raise ValueError(
                f"unknown mesh contact_mode {contact_mode!r} "
                "(use sort/sweep/block/table)")

    if spring_mode not in ("gs", "chebyshev", "jacobi"):
        raise ValueError(f"unknown mesh spring_mode {spring_mode!r}")
    solve_fn = lambda Px: solve_springs_mesh(Px, w, topo,
                                             params.relaxation_factor)
    normals_fn = None
    if aero:  # dynamic-triangle drag/lift (NvFlex.h:120-122), mesh form
        from flingbot_tpu.engine.aero import mesh_normals

        normals_fn = lambda Px: mesh_normals(
            Px, topo.triangles, topo.tri_mask, state.active)
    P, V = _run_substeps(
        P, V, w, moving, params, substeps, iterations, solve_fn,
        contact_fn, state.picker_pos, picker_radius, normals_fn,
        contact_every,
        chebyshev=(spring_mode in ("gs", "chebyshev")),
    )
    return state.replace(
        positions=P.T, velocities=V.T, time=state.time + params.dt,
        step_count=state.step_count + 1,
        sweep_perm=perm if perm is not None else state.sweep_perm,
        sweep_inv=inv_perm if inv_perm is not None else state.sweep_inv,
    )


def substep(*args, **kwargs):  # pragma: no cover - thin alias
    return _substep(*args, **kwargs)


def make_step_fn(topo, params: Optional[SolverParams] = None, **static):
    """Convenience: returns a jitted `state -> state` closure."""
    params = params or SolverParams()
    fn = functools.partial(step, topo=topo, params=params, **static)
    return jax.jit(lambda s: fn(s))
