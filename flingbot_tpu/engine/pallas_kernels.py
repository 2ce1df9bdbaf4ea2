"""Pallas TPU kernels for the XPBD hot loop.

Two VMEM-resident kernels implement the whole physics tick (see the
"Round-2 fused kernels" banner below for the design rationale):
`pallas_substeps` (N substeps of Chebyshev-Jacobi spring projection +
ground plane + picker spheres + velocity finalize per launch) and
`pallas_contacts` (self-collision on Morton-sorted arrays).  Everything
numeric matches solver.py's XLA formulation (spring_mode="chebyshev" /
contact_mode="sort"), which tests cross-check in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flingbot_tpu.engine.topology import GRID_STENCIL_CLASSES

_EPS = 1e-9


def _shift(a, dy, dx):
    """out[..., y, x] = a[..., y+dy, x+dx] WITH WRAPAROUND (tpu.rotate —
    Mosaic has no pad/slice shift).  Callers must mask wrap positions:
    forward reads are masked by the pair-validity tests; for the
    accumulate-side shift-back the pair masks already zero every
    coefficient that could wrap."""
    out = a
    if dy:
        # pltpu.roll requires a non-negative shift
        out = pltpu.roll(out, (-dy) % a.shape[-2], axis=out.ndim - 2)
    if dx:
        out = pltpu.roll(out, (-dx) % a.shape[-1], axis=out.ndim - 1)
    return out


# ==========================================================================
# Round-2 fused kernels
# ==========================================================================
#
# The round-1 pipeline ran one pallas launch per substep (springs only) with
# contacts + picker + finalize in XLA between launches; the profile showed
# the XLA contact loop DMA-choked and the kernel spending half its time on
# masked-out work (2-color GS phases compute the full lattice but project
# only half the constraints).  The round-2 design:
#
#   * `pallas_substeps` — N substeps in ONE launch: integrate -> `iterations`
#     x (6-class Jacobi springs with eNvFlexRelaxationLocal normalization +
#     Chebyshev semi-iterative acceleration [Wang 2015] + ground plane) ->
#     picker spheres -> velocity finalize.  Jacobi projects every constraint
#     of a class per pass (no color masking), so it does the same useful
#     projections as 2-color GS in half the vector work; Chebyshev restores
#     the convergence rate.
#   * `pallas_contacts` — self-collision on Morton-SORTED arrays (the sort
#     itself is a multi-operand jax.lax.sort outside the kernel — 4x cheaper
#     than a gather on TPU): `iterations` x (sorted-window pair sweep with
#     PBD Coulomb friction + ground plane), VMEM-resident.  Sorted-window
#     shifts are "folded rolls": the (N,) sorted order is reshaped (R, C)
#     row-major, a logical shift by k is a lane roll plus a sublane-rolled
#     lane roll selected at the row seam.
#
# Reference contract being implemented: NvFlexUpdateSolver's per-substep
# pipeline (predict / solveSprings / solveContacts / applyDeltas / finalize,
# NvFlex.h:197-223) at softgym_cloth.h:154-170 settings.

SUB_PARAM_LEN = 21
# [0]=dt_sub [1]=gravity_y [2]=damping [3]=dynamic_friction
# [4]=collision_distance [5]=relaxation [6]=spacing
# [7..9]=stiffness(stretch,bend,shear) [10]=dimx [11]=dimy
# [12]=picker_R (radius+coldist) [13]=cheb_rho2
# [14..16]=picker0 xyz [17..19]=picker1 xyz [20]=max_acceleration

CHEB_DELAY = 2
# under-relaxation of the Chebyshev update; must equal
# solver.CHEBYSHEV_GAMMA (the maxAcceleration clamp makes gamma=1 stable,
# see the note there)
CHEB_GAMMA = 1.0


def _substeps_kernel(param_ref, P_ref, V_ref, w_ref,
                     out_P_ref, out_V_ref, out_prev_ref,
                     *, H, W, n_sub, iterations, cheb, picker_last):
    """n_sub XPBD substeps for ONE env; arrays (3, 1, H, W) / (1, H, W).

    Substep ordering matches solver._substep + _run_substeps exactly:
    integrate -> iterate (springs + plane) -> velocity finalize with the
    maxAcceleration clamp (spring-phase only; see the deviation note in
    solver._substep) -> picker spheres POSITION-ONLY.  When
    picker_last=False the last substep's picker push is omitted so the
    caller can insert the contact group first (contacts -> plane ->
    velocity add under the same speed-up-only clamp -> picker, the
    solver._substep order)."""
    dt = param_ref[0, 0]
    gravity_y = param_ref[0, 1]
    damping = param_ref[0, 2]
    mu = param_ref[0, 3]
    coldist = param_ref[0, 4]
    relax = param_ref[0, 5]
    spacing = param_ref[0, 6]
    dimx = param_ref[0, 10]
    dimy = param_ref[0, 11]
    picker_R = param_ref[0, 12]
    rho2 = param_ref[0, 13]
    a_max = param_ref[0, 20]

    P = P_ref[:]  # (3, 1, H, W)
    V = V_ref[:]
    w = w_ref[:]  # (1, H, W)

    iyi = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ixi = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    dimx_i = dimx.astype(jnp.int32)
    dimy_i = dimy.astype(jnp.int32)
    valid = (iyi < dimy_i) & (ixi < dimx_i)
    w = jnp.where(valid, w, 0.0)
    moving = valid & (w > 0)
    mm = moving[None]
    mov_f = moving.astype(P.dtype)

    # --- per-class constant coefficient planes (w is static per call) ----
    # gA = stiff * w   / (w + wb)  at the constraint's start particle
    # gB = stiff * wb  / (w + wb)  (applied to the neighbor via roll-back;
    #      pair_ok masking makes the roll's wraparound harmless: wrapped
    #      values always carry a zero coefficient)
    stiff_all = [param_ref[0, 7], param_ref[0, 8], param_ref[0, 9]]
    classes = []
    count = jnp.zeros((1, H, W), P.dtype)
    for dy, dx, rest_k, cls in GRID_STENCIL_CLASSES:
        rest = rest_k * spacing
        stiff = stiff_all[cls]
        wb = _shift(w, dy, dx)
        nbr_ok = ((iyi + dy >= 0) & (iyi + dy < dimy_i)
                  & (ixi + dx >= 0) & (ixi + dx < dimx_i))
        pair_ok = valid & nbr_ok
        denom = w + wb
        live = pair_ok & (denom > 0)
        inv = stiff / (denom + _EPS)
        gA = jnp.where(live, w * inv, 0.0)
        gB = jnp.where(live, wb * inv, 0.0)
        live_f = live.astype(P.dtype)
        count = count + live_f + _shift(live_f, -dy, -dx)
        classes.append((dy, dx, rest, gA, gB))
    invc = relax / jnp.maximum(count, 1.0)

    def jacobi(P):
        acc0 = jnp.zeros((1, H, W), P.dtype)
        acc1 = jnp.zeros((1, H, W), P.dtype)
        acc2 = jnp.zeros((1, H, W), P.dtype)
        # roll chaining: the two diagonal (shear) forward shifts derive
        # from the (1, 0) shift with ONE extra lane roll each instead of a
        # sublane + lane roll pair (pltpu.roll is one op regardless of
        # shift distance, so only multi-axis shifts benefit).  Bit-exact:
        # rolls are pure permutations and compose.
        S10 = _shift(P, 1, 0)
        for dy, dx, rest, gA, gB in classes:
            if (dy, dx) == (1, 0):
                Pb = S10
            elif dy == 1 and dx != 0:
                Pb = _shift(S10, 0, dx)
            else:
                Pb = _shift(P, dy, dx)
            d0 = Pb[0] - P[0]
            d1 = Pb[1] - P[1]
            d2 = Pb[2] - P[2]
            r = jax.lax.rsqrt(d0 * d0 + d1 * d1 + d2 * d2 + _EPS)
            e = 1.0 - rest * r  # (dist - rest) / dist
            a = gA * e
            b = gB * e
            acc0 = acc0 + a * d0 - _shift(b * d0, -dy, -dx)
            acc1 = acc1 + a * d1 - _shift(b * d1, -dy, -dx)
            acc2 = acc2 + a * d2 - _shift(b * d2, -dy, -dx)
        return jnp.stack([P[0] + invc * acc0,
                          P[1] + invc * acc1,
                          P[2] + invc * acc2])

    def plane(P, prev):
        y = P[1]
        pen = coldist - y
        contact_f = jnp.where(pen > 0, mov_f, 0.0)
        dy_ = contact_f * pen
        dx_ = P[0] - prev[0]
        dz_ = P[2] - prev[2]
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        f = contact_f * jnp.minimum(
            1.0, mu * jnp.maximum(pen, 0.0) / t_norm)
        return jnp.stack([P[0] - dx_ * f, P[1] + dy_, P[2] - dz_ * f])

    def integrate_iterate(P, V):
        """integrate -> constraint iterations (springs + plane)."""
        V = jnp.stack([V[0], V[1] + dt * gravity_y, V[2]])
        V = V * jnp.maximum(0.0, 1.0 - damping * dt)
        V = jnp.where(mm, V, 0.0)
        prev = P
        P = jnp.where(mm, P + dt * V, P)

        if cheb:
            # Chebyshev loop with the warm-up (it < CHEB_DELAY) and the
            # first accelerated iteration (omega = 2/(2-rho2)) PEELED out
            # of the fori_loop: drops the per-iteration it<DELAY selects
            # entirely, and at CHEB_GAMMA == 1.0 replaces the damping
            # blend 1*(Pn-P)+P with Pn itself — the compiler cannot fold
            # that ((a-b)+b != a in floats).  Semantics identical to the
            # round-3 single-loop form (parity tests unchanged).
            def damp(P_next, P):
                if CHEB_GAMMA == 1.0:
                    return P_next
                return CHEB_GAMMA * (P_next - P) + P

            P_prev = P
            for _ in range(min(CHEB_DELAY, iterations)):
                P_prev, P = P, plane(jacobi(P), prev)
            if iterations > CHEB_DELAY:
                omega0 = 2.0 / (2.0 - rho2)
                P_acc = omega0 * (damp(jacobi(P), P) - P_prev) + P_prev
                P_prev, P = P, plane(P_acc, prev)

                def body(_, carry):
                    P, P_prev, omega = carry
                    omega = 4.0 / (4.0 - rho2 * omega)
                    P_acc = omega * (damp(jacobi(P), P) - P_prev) + P_prev
                    return (plane(P_acc, prev), P, omega)

                P, _, _ = jax.lax.fori_loop(
                    CHEB_DELAY + 1, iterations, body, (P, P_prev, omega0))
        else:
            def body(_, P):
                return plane(jacobi(P), prev)

            P = jax.lax.fori_loop(0, iterations, body, P)
        return P, V, prev

    def clamp_finalize(P, V, prev):
        """Velocity finalize with the speed-up-only acceleration clamp
        (NvFlexParams.maxAcceleration, main.cpp:786): solver-injected
        energy (Chebyshev overshoot) is capped; decelerations (floor/pile
        impacts) pass through — see the deviation note in
        solver._substep."""
        V_new = (P - prev) / dt
        dv0 = V_new[0] - V[0]
        dv1 = V_new[1] - V[1]
        dv2 = V_new[2] - V[2]
        r = jax.lax.rsqrt(dv0 * dv0 + dv1 * dv1 + dv2 * dv2 + _EPS)
        speeding = (V_new[0] * V_new[0] + V_new[1] * V_new[1]
                    + V_new[2] * V_new[2]
                    > V[0] * V[0] + V[1] * V[1] + V[2] * V[2])
        sc = jnp.where(speeding, jnp.minimum(1.0, a_max * dt * r), 1.0)
        return jnp.where(mm, jnp.stack(
            [V[0] + dv0 * sc, V[1] + dv1 * sc, V[2] + dv2 * sc]), V)

    def picker_push(P):
        """Picker spheres POSITION-ONLY (FleX sphere shapes,
        flex_utils.py:83; solver._run_substeps applies them after the
        velocity update)."""
        for k in range(2):
            c0 = param_ref[0, 14 + 3 * k]
            c1 = param_ref[0, 15 + 3 * k]
            c2 = param_ref[0, 16 + 3 * k]
            d0 = P[0] - c0
            d1 = P[1] - c1
            d2 = P[2] - c2
            sq = d0 * d0 + d1 * d1 + d2 * d2 + _EPS
            r = jax.lax.rsqrt(sq)
            pen = picker_R - sq * r
            push = jnp.where((pen > 0) & moving, pen * r, 0.0)
            P = jnp.stack([P[0] + d0 * push, P[1] + d1 * push,
                           P[2] + d2 * push])
        return P

    def one_substep(_, carry):
        P, V = carry
        P, V, prev = integrate_iterate(P, V)
        V = clamp_finalize(P, V, prev)
        return picker_push(P), V

    if n_sub > 1:
        P, V = jax.lax.fori_loop(0, n_sub - 1, one_substep, (P, V))
    P, V, prev_last = integrate_iterate(P, V)
    V = clamp_finalize(P, V, prev_last)
    if picker_last:
        P = picker_push(P)

    out_P_ref[:] = P
    out_V_ref[:] = V
    out_prev_ref[:] = prev_last


@functools.partial(
    jax.jit,
    static_argnames=("n_sub", "iterations", "cheb", "picker_last",
                     "interpret"),
)
def pallas_substeps(params_vec, P, V, w, *, n_sub, iterations: int = 30,
                    cheb: bool = True, picker_last: bool = True,
                    interpret: bool = False):
    """n_sub fused XPBD substeps (springs+plane+finalize+picker) per env.

    params_vec (B, SUB_PARAM_LEN) f32; P, V (B, 3, H, W); w (B, H, W).
    Returns (P', V', prev_last) where prev_last is the position at the
    start of the LAST substep.  With picker_last=False the last substep
    omits the picker push so the caller can insert the contact projection
    first (exact solver._substep ordering)."""
    B, _, H, W = P.shape
    kernel = functools.partial(_substeps_kernel, H=H, W=W, n_sub=n_sub,
                               iterations=iterations, cheb=cheb,
                               picker_last=picker_last)
    Pt = jnp.swapaxes(P, 0, 1)  # (3, B, H, W)
    Vt = jnp.swapaxes(V, 0, 1)
    blk3 = pl.BlockSpec((3, 1, H, W), lambda b: (0, b, 0, 0),
                        memory_space=pltpu.VMEM)
    out_P, out_V, out_prev = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SUB_PARAM_LEN), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            blk3, blk3,
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[blk3, blk3, blk3],
        out_shape=[jax.ShapeDtypeStruct(Pt.shape, P.dtype)] * 3,
        interpret=interpret,
    )(params_vec, Pt, Vt, w)
    return (jnp.swapaxes(out_P, 0, 1), jnp.swapaxes(out_V, 0, 1),
            jnp.swapaxes(out_prev, 0, 1))


def pack_sub_params(params, topo, picker_pos, picker_radius, dt_sub,
                    cheb_rho: float):
    """SolverParams + GridTopology + picker state -> (SUB_PARAM_LEN,) f32."""
    return jnp.stack([
        jnp.float32(dt_sub),
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
        jnp.float32(picker_radius) + params.collision_distance,
        jnp.float32(cheb_rho * cheb_rho),
        picker_pos[0, 0], picker_pos[0, 1], picker_pos[0, 2],
        picker_pos[1, 0], picker_pos[1, 1], picker_pos[1, 2],
        params.max_acceleration,
    ])


# --------------------------------------------------------------------------
# sorted-window contact kernel
# --------------------------------------------------------------------------

CONTACT_PARAM_LEN = 8
# [0]=rest_dist [1]=w_uniform [2]=mu_pair [3]=mu_plane
# [4]=collision_distance [5]=n_active(f32) [6]=unused [7]=unused

PACK_IMMOBILE_BIT = 20
PACK_INACTIVE_BIT = 21


def _folded_shift(x, k, C, sub_rolled=None):
    """Logical shift by +k of a row-major (R, C)-folded 1-D array:
    out[i] = x[i + k] (wrap across the array end is garbage; callers mask
    by in-range iota tests).  One lane roll of x and one of its
    sublane-rolled copy, selected at the row seam."""
    lane = x.ndim - 1
    if sub_rolled is None:
        sub_rolled = pltpu.roll(x, x.shape[-2] - 1, axis=x.ndim - 2)
    a = pltpu.roll(x, C - k, axis=lane)
    b = pltpu.roll(sub_rolled, C - k, axis=lane)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, lane)
    return jnp.where(ci < C - k, a, b)


def _contacts_kernel(param_ref, x_ref, y_ref, z_ref,
                     px_ref, py_ref, pz_ref, packed_ref,
                     *refs, R, C, window, iterations, mesh=False):
    """Self-collision contact projection in Morton-sorted order for ONE env.

    All arrays are (1, R, C): the sorted (N,) order reshaped row-major, so
    sorted slot i lives at [i // C, i % C].  Pairs (i, i+k) for k=1..window
    are tested per iteration; the rest-pose SelfCollideFilter
    (NvFlex.h:166) drops lattice-neighbor pairs via the packed lattice
    coordinates (grid mode) or pairs under rest_dist apart in the rest pose
    (mesh mode: three extra sorted rest-coordinate inputs)."""
    if mesh:
        rx_ref, ry_ref, rz_ref, ox_ref, oy_ref, oz_ref = refs
    else:
        ox_ref, oy_ref, oz_ref = refs
    rest_d = param_ref[0, 0]
    w_uni = param_ref[0, 1]
    mu_p = param_ref[0, 2]
    mu_plane = param_ref[0, 3]
    coldist = param_ref[0, 4]

    X = x_ref[:]  # (1, R, C)
    Y = y_ref[:]
    Z = z_ref[:]
    PX = px_ref[:]
    PY = py_ref[:]
    PZ = pz_ref[:]
    pk = packed_ref[:]

    lat_x = pk & 0xFF
    lat_y = (pk >> 8) & 0xFFF  # bits 8-19 (pack_lattice_ids)
    immobile = ((pk >> PACK_IMMOBILE_BIT) & 1) > 0
    inactive = ((pk >> PACK_INACTIVE_BIT) & 1) > 0
    active = ~inactive
    w = jnp.where(immobile | inactive, 0.0, w_uni)
    ms = active & ~immobile  # moving mask in sorted order
    ms_f = ms.astype(X.dtype)

    ri = jax.lax.broadcasted_iota(jnp.int32, (1, R, C), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, R, C), 2)
    i_flat = ri * C + ci
    N = R * C

    # hoisted per-k static pair data
    def sub_roll(a):
        return pltpu.roll(a, R - 1, axis=a.ndim - 2)

    pk_s = sub_roll(pk)
    w_s = sub_roll(w)
    PX_s, PY_s, PZ_s = sub_roll(PX), sub_roll(PY), sub_roll(PZ)
    act_s = sub_roll(active.astype(jnp.int32))
    if mesh:
        RX, RY, RZ = rx_ref[:], ry_ref[:], rz_ref[:]
        RX_s, RY_s, RZ_s = sub_roll(RX), sub_roll(RY), sub_roll(RZ)

    ks = list(range(1, window + 1))
    static_k = []
    for k in ks:
        in_range = i_flat < N - k
        act_n = _folded_shift(active.astype(jnp.int32), k, C, act_s) > 0
        if mesh:
            rd0 = RX - _folded_shift(RX, k, C, RX_s)
            rd1 = RY - _folded_shift(RY, k, C, RY_s)
            rd2 = RZ - _folded_shift(RZ, k, C, RZ_s)
            nbr = rd0 * rd0 + rd1 * rd1 + rd2 * rd2 < rest_d * rest_d
        else:
            pk_n = _folded_shift(pk, k, C, pk_s)
            lat_xn = pk_n & 0xFF
            lat_yn = (pk_n >> 8) & 0xFFF  # bits 8-19 (pack_lattice_ids)
            nbr = ((jnp.abs(lat_xn - lat_x) <= 1)
                   & (jnp.abs(lat_yn - lat_y) <= 1))
        ok = in_range & active & act_n & ~nbr
        wn = _folded_shift(w, k, C, w_s)
        wsum = w + wn
        ok = ok & (wsum > 0)
        coef = jnp.where(ok, 1.0 / (wsum + _EPS), 0.0)  # pen share / dist
        dpx = PX - _folded_shift(PX, k, C, PX_s)
        dpy = PY - _folded_shift(PY, k, C, PY_s)
        dpz = PZ - _folded_shift(PZ, k, C, PZ_s)
        static_k.append((ok, coef, wn, dpx, dpy, dpz))

    def one_iter(_, carry):
        X, Y, Z = carry
        X_s, Y_s, Z_s = sub_roll(X), sub_roll(Y), sub_roll(Z)
        acc_x = jnp.zeros((1, R, C), X.dtype)
        acc_y = jnp.zeros((1, R, C), X.dtype)
        acc_z = jnp.zeros((1, R, C), X.dtype)
        cnt = jnp.zeros((1, R, C), X.dtype)
        for idx, k in enumerate(ks):
            ok, coef, wn, dpx, dpy, dpz = static_k[idx]
            Xn = _folded_shift(X, k, C, X_s)
            Yn = _folded_shift(Y, k, C, Y_s)
            Zn = _folded_shift(Z, k, C, Z_s)
            d0 = X - Xn
            d1 = Y - Yn
            d2 = Z - Zn
            sq = d0 * d0 + d1 * d1 + d2 * d2 + _EPS
            r = jax.lax.rsqrt(sq)
            pen = rest_d - sq * r  # dist = sq * rsqrt(sq)
            live = pen > 0
            s = jnp.where(live, coef * pen * r, 0.0)
            live_f = jnp.where(live & ok, 1.0, 0.0)
            # friction: tangential part of this substep's pair motion
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
            # corrections: i gets +w_i*(s*d - coef*fr*t); the neighbor the
            # opposite with w_n.  (s and coef fold the 1/wsum mass share;
            # matches solve_contacts_sweep's PBD Coulomb model.)
            gx = s * d0 - fsc * t0
            gy = s * d1 - fsc * t1
            gz = s * d2 - fsc * t2
            acc_x = acc_x + w * gx
            acc_y = acc_y + w * gy
            acc_z = acc_z + w * gz
            cnt = cnt + live_f
            # shift corrections back to the neighbor (shift by -k =
            # folded shift with negated k: lane roll k, sublane roll +1 at
            # the seam)
            bx = wn * gx
            by = wn * gy
            bz = wn * gz

            def back(v):
                vs = pltpu.roll(v, 1, axis=v.ndim - 2)
                a = pltpu.roll(v, k, axis=v.ndim - 1)
                b = pltpu.roll(vs, k, axis=v.ndim - 1)
                return jnp.where(ci >= k, a, b)

            acc_x = acc_x - back(bx)
            acc_y = acc_y - back(by)
            acc_z = acc_z - back(bz)
            cnt = cnt + back(live_f)
        inv_cnt = ms_f / jnp.maximum(cnt, 1.0)
        X = X + acc_x * inv_cnt
        Y = Y + acc_y * inv_cnt
        Z = Z + acc_z * inv_cnt
        # ground plane with Coulomb friction, in sorted order
        pen = coldist - Y
        contact_f = jnp.where(pen > 0, ms_f, 0.0)
        dx_ = X - PX
        dz_ = Z - PZ
        t_norm = jnp.sqrt(dx_ * dx_ + dz_ * dz_ + _EPS)
        f = contact_f * jnp.minimum(
            1.0, mu_plane * jnp.maximum(pen, 0.0) / t_norm)
        return (X - dx_ * f, Y + contact_f * pen, Z - dz_ * f)

    X, Y, Z = jax.lax.fori_loop(0, iterations, one_iter, (X, Y, Z))
    ox_ref[:] = X
    oy_ref[:] = Y
    oz_ref[:] = Z


@functools.partial(
    jax.jit,
    static_argnames=("window", "iterations", "interpret"),
)
def pallas_contacts(params_vec, xs, ys, zs, pxs, pys, pzs, packed,
                    rests=None, *, window: int = 16, iterations: int = 8,
                    interpret: bool = False):
    """Contact projection on Morton-sorted, (B, R, C) row-major-folded
    positions.  Returns updated (xs, ys, zs).  Pass rests = (rx, ry, rz)
    sorted rest coordinates for the mesh-mode SelfCollideFilter."""
    B, R, C = xs.shape
    mesh = rests is not None
    kernel = functools.partial(_contacts_kernel, R=R, C=C, window=window,
                               iterations=iterations, mesh=mesh)
    blk = pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    inputs = [params_vec, xs, ys, zs, pxs, pys, pzs, packed]
    n_blk = 7
    if mesh:
        inputs += list(rests)
        n_blk += 3
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, CONTACT_PARAM_LEN), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ] + [blk] * n_blk,
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct(xs.shape, xs.dtype)] * 3,
        interpret=interpret,
    )(*inputs)
    return out
