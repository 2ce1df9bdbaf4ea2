"""Pallas TPU kernels for the XPBD hot loop.

The XLA path in solver.py materializes the lattice between constraint
phases; this kernel keeps one environment's whole substep — integrate,
`iterations` x (6 stencil spring classes x 2 GS colors + ground plane with
Coulomb friction), velocity finalize — resident in VMEM, reading and
writing HBM exactly once per substep.  Per-env state is ~350 KB, far under
the ~16 MB VMEM budget; the pallas grid runs one program per environment.

Everything numeric matches solver.py's stencil formulation (see
solve_springs_grid / solve_plane there for the NvFlex parameter semantics
and reference citations); tests cross-check the two paths bit-for-bit-ish
(float tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flingbot_tpu.engine.topology import GRID_STENCIL_CLASSES

_EPS = 1e-9

# packed scalar-param vector layout (per env)
# [0]=dt  [1]=gravity_y [2]=damping [3]=dynamic_friction
# [4]=collision_distance [5]=relaxation [6]=spacing
# [7]=stiff_stretch [8]=stiff_bend [9]=stiff_shear
# [10]=dimx [11]=dimy
PARAM_LEN = 12


def _shift(a, dy, dx):
    """out[..., y, x] = a[..., y+dy, x+dx] WITH WRAPAROUND (tpu.rotate —
    Mosaic has no pad/slice shift).  Callers must mask wrap positions:
    forward reads are masked by the pair-validity tests, the dB shift-back
    multiplies by an explicit in-range mask."""
    out = a
    if dy:
        # pltpu.roll requires a non-negative shift
        out = pltpu.roll(out, (-dy) % a.shape[-2], axis=out.ndim - 2)
    if dx:
        out = pltpu.roll(out, (-dx) % a.shape[-1], axis=out.ndim - 1)
    return out


def _substep_kernel(param_ref, P_ref, V_ref, w_ref, out_P_ref, out_V_ref,
                    *, H, W, E, iterations):
    """Processes a block of E environments per program; arrays are laid out
    component-leading (3, E, H, W) so every vector instruction works on
    E * ceil(H/8) * ceil(W/128) tiles (amortizing issue overhead)."""
    dt = param_ref[0, 0]
    gravity_y = param_ref[0, 1]
    damping = param_ref[0, 2]
    mu = param_ref[0, 3]
    coldist = param_ref[0, 4]
    relax = param_ref[0, 5]
    spacing = param_ref[0, 6]
    # per-env fields within the block
    stiffness = [
        jnp.stack([param_ref[e, c] for e in range(E)]).reshape(E, 1, 1)
        for c in (7, 8, 9)
    ]
    dimx = jnp.stack(
        [param_ref[e, 10] for e in range(E)]).reshape(E, 1, 1)
    dimy = jnp.stack(
        [param_ref[e, 11] for e in range(E)]).reshape(E, 1, 1)

    P = P_ref[:]  # (3, E, H, W)
    V = V_ref[:]
    w = w_ref[:]  # (E, H, W)

    # Mosaic iota must be integer-typed
    iyi = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ixi = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    dimx_i = dimx.astype(jnp.int32)
    dimy_i = dimy.astype(jnp.int32)
    valid = (iyi < dimy_i) & (ixi < dimx_i)  # (E, H, W)

    def nbr_valid(dy, dx):
        # validity of the (y+dy, x+dx) neighbor, computed from iota instead
        # of shifting the bool mask (Mosaic cannot pad bool vectors)
        return (
            (iyi + dy >= 0) & (iyi + dy < dimy_i)
            & (ixi + dx >= 0) & (ixi + dx < dimx_i)
        )
    w = jnp.where(valid, w, 0.0)
    moving = valid & (w > 0)
    mm = moving[None]

    # integrate (no .at indexed update — Mosaic has no scatter)
    V = jnp.stack([V[0], V[1] + dt * gravity_y, V[2]])  # (3, E, H, W)
    V = V * jnp.maximum(0.0, 1.0 - damping * dt)
    V = jnp.where(mm, V, 0.0)
    prev = P
    P = jnp.where(mm, P + dt * V, P)

    # ---- hoist per-phase constant fields out of the iteration loop -------
    # coefA = relax*stiff*w_a/(w_a+w_b) on valid constraints (0 elsewhere),
    # coefB likewise for the neighbor endpoint, mB = in-range mask for the
    # shift-back.  The inner loop is then pure roll + fma work.
    phases = []
    for dy, dx, rest_k, cls in GRID_STENCIL_CLASSES:
        rest = rest_k * spacing
        stiff = stiffness[cls]
        for color in (0, 1):
            if (dy, dx) == (0, 1):
                sel = (ixi % 2) == color
            elif (dy, dx) == (1, 0):
                sel = (iyi % 2) == color
            elif (dy, dx) == (0, 2):
                sel = ((ixi // 2) % 2) == color
            elif (dy, dx) == (2, 0):
                sel = ((iyi // 2) % 2) == color
            else:
                sel = (iyi % 2) == color
            wb = _shift(w, dy, dx)
            pair_ok = sel & valid & nbr_valid(dy, dx)
            denom = w + wb
            live = pair_ok & (denom > 0)
            inv = relax * stiff / (denom + _EPS)
            coefA = jnp.where(live, w * inv, 0.0)
            coefB = jnp.where(live, wb * inv, 0.0)
            back_ok = (
                (iyi - dy >= 0) & (iyi - dy < H)
                & (ixi - dx >= 0) & (ixi - dx < W)
            )
            mB = jnp.broadcast_to(back_ok, coefA.shape).astype(P.dtype)
            phases.append((dy, dx, rest, coefA, coefB, mB))

    def spring_phase(P, phase):
        dy, dx, rest, coefA, coefB, mB = phase
        Pb = _shift(P, dy, dx)
        d = Pb - P
        dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + _EPS)
        e = (dist - rest) / dist  # relative extension
        dA = (coefA * e)[None] * d
        dB = (coefB * e)[None] * d
        return P + dA - mB[None] * _shift(dB, -dy, -dx)

    mu_pen = mu  # plane friction coefficient
    mov_f = moving.astype(P.dtype)

    def plane(P):
        y = P[1]
        pen = coldist - y
        contact_f = jnp.where(pen > 0, mov_f, 0.0)
        dy_ = contact_f * pen
        dx_ = P[0] - prev[0]
        dz_ = P[2] - prev[2]
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        f = contact_f * jnp.minimum(
            1.0, mu_pen * jnp.maximum(pen, 0.0) / t_norm)
        return jnp.stack([P[0] - dx_ * f, P[1] + dy_, P[2] - dz_ * f])

    def body(_, P):
        for phase in phases:
            P = spring_phase(P, phase)
        return plane(P)

    P = jax.lax.fori_loop(0, iterations, body, P, unroll=False)
    # NOTE: no velocity finalize here — the caller may still apply
    # self-collision contacts to P before computing V = (P - prev) / dt
    # (prev is the caller's input P).  V output is the predicted velocity.

    out_P_ref[:] = P
    out_V_ref[:] = V


def _pick_env_block(B: int) -> int:
    for e in (8, 4, 2):
        if B % e == 0:
            return e
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "interpret"),
)
def pallas_substep(params_vec, P, V, w, iterations: int = 30,
                   interpret: bool = False):
    """One XPBD substep for a batch of grid-cloth envs.

    params_vec (B, PARAM_LEN) f32; P, V (B, 3, H, W); w (B, H, W).
    Returns (P', V').  Internally processes env blocks of up to 8 in a
    component-leading (3, E, H, W) layout."""
    B, _, H, W = P.shape
    E = _pick_env_block(B)
    kernel = functools.partial(_substep_kernel, H=H, W=W, E=E,
                               iterations=iterations)
    Pt = jnp.swapaxes(P, 0, 1)  # (3, B, H, W)
    Vt = jnp.swapaxes(V, 0, 1)
    out_P, out_V = pl.pallas_call(
        kernel,
        grid=(B // E,),
        in_specs=[
            pl.BlockSpec((E, PARAM_LEN), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, E, H, W), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, E, H, W), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, E, H, W), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, E, H, W), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(Pt.shape, P.dtype),
            jax.ShapeDtypeStruct(Vt.shape, V.dtype),
        ],
        interpret=interpret,
    )(params_vec, Pt, Vt, w)
    return jnp.swapaxes(out_P, 0, 1), jnp.swapaxes(out_V, 0, 1)


def pack_params(params, topo):
    """SolverParams + GridTopology -> (PARAM_LEN,) f32 vector (per env).
    dt here is the SUBSTEP dt."""
    return jnp.stack([
        jnp.float32(0.0),  # slot 0 (substep dt) filled by caller
        params.gravity[1],
        params.damping,
        params.dynamic_friction,
        params.collision_distance,
        params.relaxation_factor,
        topo.spacing,
        topo.stiffness[0],
        topo.stiffness[1],
        topo.stiffness[2],
        topo.dimx.astype(jnp.float32),
        topo.dimy.astype(jnp.float32),
    ])
