"""Manipulation primitives as data-driven trajectory programs.

The reference executes primitives as Python control flow around a blocking
Cartesian servo: movep drives both pickers toward targets in per-sim-step
increments (environment/simEnv.py:739-769), stretch_cloth widens the grasp
until the cloth midpoint stops moving (simEnv.py:140-184), lift_cloth raises
until the cloth clears the ground (simEnv.py:186-200), and
pick_and_fling / pick_and_drag / pick_and_place / pick_stretch_drag sequence
them (simEnv.py:262-429).

TPU-native design: a primitive is a *program* — a fixed-length array of
instructions — executed by ONE `lax.while_loop` whose body contains ONE
solver step.  Each instruction is a phase:

  kind 0  MOVE      servo to target = base + cd*grasp_dist + ch*fling_height
  kind 1  STRETCH   closed-loop grasp widening with midpoint-stability test
  kind 2  LIFT      raise fling height until the cloth clears the ground
  kind 3  CHECKGRASP if cloth not lifted (max y < 0.2) -> terminate + jump
  kind 4  CONDJUMP  jump if a build-time condition holds (e.g. no valid grasp)
  kind 5  DRAGREL   servo to picker_pos + drag_direction (stretchdrag)
  kind 6  STABILIZE release grasps, park arms, sim until max |v| < tol
                    (the reference's postaction wait_until_stable,
                    simEnv.py:469-477 / flex_utils.py:430-441, as the final
                    phase of the program)

Because instructions are plain arrays, programs built from *traced* action
parameters (p1, p2, grasp flags) stay inside jit, the interpreter compiles
once per topology, and the whole thing vmaps over environments — the analog
of the reference's Ray pool of Python loops, with zero host round-trips.

Two execution modes:
  * `run_program`: the whole program as ONE `lax.while_loop` (one device
    call per env step — the round-1/2 fused path).
  * `program_chunk` + `init_program_carry`: host-driven chunked execution —
    each device call runs at most `chunk_steps` sim steps and returns the
    carry + a done flag.  Bounding the per-call duration is what fixes the
    TPU worker kernel-fault on long-running vmapped programs (round-2 known
    issue: batch >= 64 crashed the worker; the per-call wall time, not the
    batch width, is the trigger), and it lets env batches scale to 128-512.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flingbot_tpu.engine.picker import picker_step, release_all
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.state import ClothState, SolverParams

MOVE, STRETCH, LIFT, CHECKGRASP, CONDJUMP, DRAGREL, STABILIZE = (
    0, 1, 2, 3, 4, 5, 6)

EPS = 1e-4  # movep convergence (simEnv.py:739)
DEFAULT_SPEED = 0.1  # movep speed=None fast path (simEnv.py:743-744)
PHASE_LIMIT = 1000  # movep step limit (simEnv.py:739)
STRETCH_INCREMENT = 0.02  # simEnv.py:144
STRETCH_MAX_DIST = 0.7  # simEnv.py:143
STRETCH_STABLE_TOL = 1.5e-2  # simEnv.py:170
LIFT_INCREMENT = 0.05  # simEnv.py:189 (lift_cloth increment_step)
LIFT_MAX_HEIGHT = 0.7
LIFT_CLEAR = 0.02  # simEnv.py:195 min height to clear ground
GRASP_CHECK_HEIGHT = 0.2  # is_cloth_grasped (simEnv.py:809-813)
STABLE_TOL = 1e-2  # wait_until_stable tolerance (flex_utils.py:430)
STABLE_MAX_STEPS = 300  # wait_until_stable step cap (flex_utils.py:430)


class Program(NamedTuple):
    """(I,)-leading instruction arrays; all leaves are jnp arrays so a
    Program built from traced values lives on device."""

    kind: jnp.ndarray  # (I,) i32
    base: jnp.ndarray  # (I, 2, 3) f32 target base
    cd: jnp.ndarray  # (I, 2, 3) f32 coefficient on grasp_dist
    ch: jnp.ndarray  # (I, 2, 3) f32 coefficient on fling_height
    grasp: jnp.ndarray  # (I, 2) f32 grasp flags during the phase
    speed: jnp.ndarray  # (I,) f32 m per sim step
    min_steps: jnp.ndarray  # (I,) i32
    jump: jnp.ndarray  # (I,) i32 jump target for kinds 3/4
    cond: jnp.ndarray  # (I,) f32 build-time condition for kind 4

    @property
    def num_instructions(self) -> int:
        return self.kind.shape[0]


class _Instr(NamedTuple):
    kind: jnp.ndarray
    base: jnp.ndarray
    cd: jnp.ndarray
    ch: jnp.ndarray
    grasp: jnp.ndarray
    speed: jnp.ndarray
    min_steps: jnp.ndarray
    jump: jnp.ndarray
    cond: jnp.ndarray


def _mk(kind, base=None, cd=None, ch=None, grasp=(0.0, 0.0), speed=DEFAULT_SPEED,
        min_steps=0, jump=0, cond=0.0):
    z = jnp.zeros((2, 3), jnp.float32)
    return _Instr(
        kind=jnp.int32(kind),
        base=z if base is None else jnp.asarray(base, jnp.float32).reshape(2, 3),
        cd=z if cd is None else jnp.asarray(cd, jnp.float32).reshape(2, 3),
        ch=z if ch is None else jnp.asarray(ch, jnp.float32).reshape(2, 3),
        grasp=jnp.asarray(grasp, jnp.float32).reshape(2),
        speed=jnp.float32(speed),
        min_steps=jnp.int32(min_steps),
        jump=jnp.int32(jump),
        cond=jnp.float32(cond),
    )


def _pack(instrs) -> Program:
    return Program(*(jnp.stack(leaves) for leaves in zip(*instrs)))


# coefficient helpers: x = +-dist/2 on pickers 0/1
_CD_X = jnp.asarray([[0.5, 0, 0], [-0.5, 0, 0]], jnp.float32)
_CH_Y = jnp.asarray([[0, 1, 0], [0, 1, 0]], jnp.float32)


class PrimitiveConfig(NamedTuple):
    """Static primitive parameters (SimEnv ctor defaults, simEnv.py:51-57)."""

    grasp_height: float = 0.02
    fling_speed: float = 6e-3
    fixed_fling_height: float = -1.0
    stretchdrag_dist: float = 0.3
    max_program_steps: int = 4000


def _park(x=0.5):
    return jnp.asarray([[x, 0.5, -0.5], [-x, 0.5, -0.5]], jnp.float32)


_RESET_TARGETS = [[0.5, 0.5, -0.5], [-0.5, 0.5, -0.5]]  # simEnv.py:771-772
_OTHER_PARK = [-0.2, 0.3, -0.2]  # idle arm parking for drag/place


def build_fling_program(p1, p2, g1, g2, cfg: PrimitiveConfig) -> Program:
    """pick_and_fling (simEnv.py:283-318) + fling_primitive (262-281)."""
    gh = cfg.grasp_height
    p1 = jnp.asarray(p1, jnp.float32).at[1].set(gh)
    p2 = jnp.asarray(p2, jnp.float32).at[1].set(gh)
    g1f = jnp.float32(g1)
    g2f = jnp.float32(g2)
    any_grasp = jnp.float32(jnp.logical_or(g1, g2))
    fixed_h = cfg.fixed_fling_height >= 0

    instrs = []
    # on an aborted primitive the reference returns immediately (the env's
    # postaction parks the arms), so all jumps target the program end
    end_pc = 11 if fixed_h else 12
    # 0: skip everything if neither point grasps cloth (simEnv.py:287-289)
    instrs.append(_mk(CONDJUMP, cond=1.0 - any_grasp, jump=end_pc))
    # 1: approach grasp points, no grasp yet (simEnv.py:297)
    instrs.append(_mk(MOVE, base=jnp.stack([p1, p2])))
    # 2: lift to pre-fling (simEnv.py:304) with grasp flags engaged
    instrs.append(_mk(
        MOVE, base=[[0, 0.3, -0.3], [0, 0.3, -0.3]], cd=_CD_X,
        grasp=jnp.stack([g1f, g2f]), speed=5e-3))
    # 3: abort if cloth didn't come up (simEnv.py:305-307)
    instrs.append(_mk(CHECKGRASP, grasp=jnp.stack([g1f, g2f]), jump=end_pc))
    # 4: stretch until taut (simEnv.py:308)
    instrs.append(_mk(STRETCH, grasp=jnp.stack([g1f, g2f]), speed=5e-4,
                      min_steps=20))
    # 5: optionally lift until cloth clears ground (simEnv.py:310-314)
    if not fixed_h:
        instrs.append(_mk(
            LIFT, base=[[0, 0, -0.3], [0, 0, -0.3]], cd=_CD_X, ch=_CH_Y,
            grasp=jnp.stack([g1f, g2f]), speed=1e-3))
    gflags = jnp.stack([g1f, g2f])
    # fling strokes (fling_primitive, simEnv.py:262-275)
    instrs.append(_mk(MOVE, base=[[0, 0, -0.2], [0, 0, -0.2]], cd=_CD_X,
                      ch=_CH_Y, grasp=gflags, speed=cfg.fling_speed))
    instrs.append(_mk(MOVE, base=[[0, 0, 0.2], [0, 0, 0.2]], cd=_CD_X,
                      ch=_CH_Y, grasp=gflags, speed=cfg.fling_speed))
    instrs.append(_mk(MOVE, base=[[0, 0, 0.2], [0, 0, 0.2]], cd=_CD_X,
                      ch=_CH_Y, grasp=gflags, speed=1e-2, min_steps=4))
    # lower + release
    instrs.append(_mk(MOVE, base=[[0, 2 * gh, -0.2], [0, 2 * gh, -0.2]],
                      cd=_CD_X, grasp=gflags, speed=1e-2))
    instrs.append(_mk(MOVE, base=[[0, 2 * gh, -0.25], [0, 2 * gh, -0.25]],
                      cd=_CD_X, grasp=gflags, speed=5e-3))
    # reset end effectors, grasp released (simEnv.py:276-281)
    instrs.append(_mk(MOVE, base=_RESET_TARGETS, speed=5e-3))
    prog = _pack(instrs)
    init_fh = cfg.fixed_fling_height if fixed_h else 0.3
    return prog, jnp.float32(init_fh)


def build_drag_program(p1, p2, g1, g2, cfg: PrimitiveConfig) -> Program:
    """pick_and_drag (simEnv.py:320-344): single-arm drag along the ground."""
    gh = cfg.grasp_height
    p1 = jnp.asarray(p1, jnp.float32).at[1].set(gh)
    p2 = jnp.asarray(p2, jnp.float32).at[1].set(gh)
    pre = p1.at[1].set(0.3)
    post = p2.at[1].set(0.3)
    other = jnp.asarray(_OTHER_PARK, jnp.float32)
    g1f = jnp.float32(g1)

    instrs = [
        _mk(CONDJUMP, cond=1.0 - g1f, jump=6),
        _mk(MOVE, base=jnp.stack([pre, other]), speed=5e-3),
        _mk(MOVE, base=jnp.stack([p1, other]), speed=5e-3),
        _mk(MOVE, base=jnp.stack([p2, other]), grasp=(1.0, 0.0), speed=5e-3),
        _mk(MOVE, base=jnp.stack([post, other]), speed=5e-3),
        _mk(MOVE, base=_RESET_TARGETS, speed=5e-3),
    ]
    return _pack(instrs), jnp.float32(0.3)


def build_place_program(p1, p2, g1, g2, cfg: PrimitiveConfig,
                        lift_height: float = 0.2) -> Program:
    """pick_and_place (simEnv.py:346-372)."""
    gh = cfg.grasp_height
    p1 = jnp.asarray(p1, jnp.float32).at[1].set(gh)
    p2 = jnp.asarray(p2, jnp.float32).at[1].set(gh)
    prepick = p1.at[1].set(lift_height)
    preplace = p2.at[1].set(lift_height)
    other = jnp.asarray(_OTHER_PARK, jnp.float32)
    g1f = jnp.float32(g1)

    instrs = [
        _mk(CONDJUMP, cond=1.0 - g1f, jump=8),
        _mk(MOVE, base=jnp.stack([prepick, other]), speed=5e-3),
        _mk(MOVE, base=jnp.stack([p1, other]), speed=5e-3),
        _mk(MOVE, base=jnp.stack([prepick, other]), grasp=(1.0, 0.0),
            speed=5e-3),
        _mk(MOVE, base=jnp.stack([preplace, other]), grasp=(1.0, 0.0),
            speed=5e-3),
        _mk(MOVE, base=jnp.stack([p2, other]), grasp=(1.0, 0.0), speed=5e-3),
        _mk(MOVE, base=jnp.stack([preplace, other]), speed=5e-3),
        _mk(MOVE, base=_RESET_TARGETS, speed=5e-3),
    ]
    return _pack(instrs), jnp.float32(0.3)


def build_stretchdrag_program(p1, p2, g1, g2, cfg: PrimitiveConfig) -> Program:
    """pick_stretch_drag (simEnv.py:374-429)."""
    gh = cfg.grasp_height
    p1 = jnp.asarray(p1, jnp.float32).at[1].set(gh)
    p2 = jnp.asarray(p2, jnp.float32).at[1].set(gh)
    pre1 = p1.at[1].set(0.3)
    pre2 = p2.at[1].set(0.3)
    g1f = jnp.float32(g1)
    g2f = jnp.float32(g2)
    both = g1f * g2f
    any_grasp = jnp.float32(jnp.logical_or(g1, g2))
    gflags = jnp.stack([g1f, g2f])

    # drag direction: cross(l - r, up) scaled (simEnv.py:409-412)
    d = p1 - p2
    drag = jnp.cross(d, jnp.asarray([0.0, 1.0, 0.0]))
    drag = cfg.stretchdrag_dist * drag / jnp.maximum(
        jnp.linalg.norm(drag), 1e-9)
    drag = drag + jnp.asarray([0.0, 0.1, 0.0])  # keep ee above cloth (:418)

    instrs = [
        _mk(CONDJUMP, cond=1.0 - any_grasp, jump=8),
        _mk(MOVE, base=jnp.stack([pre1, pre2])),
        _mk(MOVE, base=jnp.stack([p1, p2]), speed=2e-3),
        # stretch only if both points grasp cloth (simEnv.py:404-406);
        # keep grasp flags through the jump so nothing is dropped
        _mk(CONDJUMP, cond=1.0 - both, jump=5, grasp=gflags),
        _mk(STRETCH, grasp=gflags, speed=5e-4, min_steps=20),
        _mk(DRAGREL, base=jnp.stack([drag, drag]), grasp=gflags, speed=2e-3),
        # postend: lift away from the drop point (approximates the
        # reference's picker-relative postend, simEnv.py:421-428)
        _mk(MOVE, base=jnp.stack([pre1 + drag, pre2 + drag])),
        _mk(MOVE, base=_RESET_TARGETS, speed=5e-3),
    ]
    # stretch at grasp height (fling_height := grasp_height, simEnv.py:405-406)
    return _pack(instrs), jnp.float32(gh)


PROGRAM_BUILDERS = {
    "fling": build_fling_program,
    "drag": build_drag_program,
    "place": build_place_program,
    "stretchdrag": build_stretchdrag_program,
}


def _append_instr(prog: Program, instr: _Instr) -> Program:
    return Program(*(
        jnp.concatenate([a, b[None]]) for a, b in zip(prog, instr)))


def append_stabilize(prog: Program) -> Program:
    """Append a STABILIZE phase at the program end.  Abort jumps in the
    builders target the old program end, so they land exactly on the
    stabilize — matching the reference, where postaction stabilization runs
    whether or not the primitive aborted (simEnv.py:466-477)."""
    return _append_instr(prog, _mk(STABILIZE, base=_RESET_TARGETS))


def pad_program(prog: Program, num_instructions: int) -> Program:
    """Pad to `num_instructions` with terminators (CONDJUMP past the end)
    so differently-sized primitive programs stack into one (P, I, ...)
    array family."""
    pad_n = num_instructions - prog.num_instructions
    if pad_n <= 0:
        return prog
    term = _mk(CONDJUMP, cond=1.0, jump=num_instructions)
    for _ in range(pad_n):
        prog = _append_instr(prog, term)
    return prog


def build_selected_program(
    primitives, prim_idx, p1, p2, g1, g2, cfg: PrimitiveConfig,
    stabilize: bool = True,
):
    """Build every primitive's program, pad to a common length, and select
    the one at (traced) `prim_idx`.  Returns (Program, init_fling_height).

    This is the chunked-execution analog of step_core's lax.switch over
    per-primitive branches: because the chunk function must compile once
    for ALL primitives, the program itself becomes data."""
    progs, fhs = [], []
    for prim in primitives:
        prog, fh = PROGRAM_BUILDERS[prim](p1, p2, g1, g2, cfg)
        if stabilize:
            prog = append_stabilize(prog)
        progs.append(prog)
        fhs.append(fh)
    if len(progs) == 1:
        return progs[0], fhs[0]
    num_i = max(p.num_instructions for p in progs)
    progs = [pad_program(p, num_i) for p in progs]
    stacked = Program(*(jnp.stack(leaves) for leaves in zip(*progs)))
    idx = jnp.asarray(prim_idx, jnp.int32)
    return (Program(*(a[idx] for a in stacked)),
            jnp.stack(fhs)[idx])


class _Carry(NamedTuple):
    state: ClothState
    pc: jnp.ndarray
    phase_step: jnp.ndarray
    total_steps: jnp.ndarray
    targets: jnp.ndarray  # (2, 3) current servo targets
    grasp_dist: jnp.ndarray
    fling_height: jnp.ndarray
    stretch_mid: jnp.ndarray  # (3,)
    stretch_dir: jnp.ndarray  # (3,)
    cloth_mid: jnp.ndarray  # (3,)
    stable_steps: jnp.ndarray
    terminate: jnp.ndarray  # bool
    frames: jnp.ndarray  # (F, cap, 3) recorded positions (F may be 0)
    frame_idx: jnp.ndarray


_PARK_POS = jnp.asarray(_RESET_TARGETS, jnp.float32)


def _release_and_park(st: ClothState) -> ClothState:
    """STABILIZE phase entry: the reference's postaction — release every
    grasp and teleport the arms out of the way (simEnv.py:469-477)."""
    st = release_all(st)
    return st.replace(picker_pos=_PARK_POS)


def _make_body(
    topo,
    params: SolverParams,
    program: Program,
    *,
    substeps: int,
    iterations: int,
    self_collision: bool,
    spring_mode: str,
    contact_mode: str,
    contact_every: int,
    contact_iterations: int,
    contact_window: int,
    backend: str,
    record_frames: int,
    record_every: int,
    aero: bool = False,
):
    """The program-interpreter loop body (shared by the fused while_loop
    path and the host-chunked path)."""
    num_instr = program.num_instructions

    def active_pos(st):
        return st.positions, st.active

    def get_instr(pc):
        pcc = jnp.clip(pc, 0, num_instr - 1)
        return _Instr(*(jax.tree_util.tree_map(lambda a: a[pcc], program)))

    def body(c: _Carry):
        ins = get_instr(c.pc)
        st = c.state
        entry = c.phase_step == 0

        # STABILIZE phase entry: release + park (postaction, simEnv.py:469)
        is_stab = ins.kind == STABILIZE
        st = jax.lax.cond(entry & is_stab, _release_and_park,
                          lambda s: s, st)

        # ---- phase-entry target setup -------------------------------------
        static_target = (
            ins.base + ins.cd * c.grasp_dist + ins.ch * c.fling_height
        )

        def stretch_entry():
            left = st.picker_pos[0].at[1].set(c.fling_height)
            right = st.picker_pos[1].at[1].set(c.fling_height)
            mid = (left + right) / 2
            direction = left - right
            direction = direction / jnp.maximum(
                jnp.linalg.norm(direction), 1e-9)
            return jnp.stack([left, right]), mid, direction

        is_stretch = ins.kind == STRETCH
        is_lift = ins.kind == LIFT
        is_dragrel = ins.kind == DRAGREL

        s_targets, s_mid, s_dir = stretch_entry()
        drag_target = st.picker_pos + ins.base

        targets = jnp.where(
            entry,
            jnp.where(
                is_stretch, s_targets,
                jnp.where(is_dragrel, drag_target,
                          jnp.where(is_lift, static_target, static_target)),
            ),
            jnp.where(is_stretch | is_lift | is_dragrel,
                      c.targets, static_target),
        )
        stretch_mid = jnp.where(entry & is_stretch, s_mid, c.stretch_mid)
        stretch_dir = jnp.where(entry & is_stretch, s_dir, c.stretch_dir)
        grasp_dist_eff = jnp.where(
            entry & is_stretch,
            jnp.linalg.norm(st.picker_pos[0] - st.picker_pos[1]),
            c.grasp_dist,
        )
        cloth_mid = jnp.where(entry & is_stretch, jnp.inf, c.cloth_mid)
        stable = jnp.where(entry & is_stretch, 0, c.stable_steps)

        # ---- reached? -----------------------------------------------------
        dists = jnp.linalg.norm(targets - st.picker_pos, axis=1)
        reached = jnp.all(dists < EPS) & (c.phase_step >= ins.min_steps)
        timeout = c.phase_step >= PHASE_LIMIT

        # ---- completion / in-phase transitions ----------------------------
        pos, act = active_pos(st)

        # STRETCH bookkeeping (simEnv.py:156-184)
        high = act & (pos[:, 1] > c.fling_height - 0.1)
        any_high = jnp.any(high)
        xs = pos[:, 0]
        single_grasp = any_high & (
            jnp.all(jnp.where(high, xs < 0, True))
            | jnp.all(jnp.where(high, xs > 0, True))
        )
        d2 = (pos[:, 0] - stretch_mid[0]) ** 2 + (pos[:, 2] - stretch_mid[2]) ** 2
        d2 = jnp.where(act, d2, jnp.inf)
        new_mid = pos[jnp.argmin(d2)]
        mid_stable = jnp.linalg.norm(new_mid - cloth_mid) < STRETCH_STABLE_TOL
        stable_next = jnp.where(mid_stable, stable + 1, 0)
        stretched = stable_next > 2
        over = grasp_dist_eff + STRETCH_INCREMENT > STRETCH_MAX_DIST
        stretch_done = reached & (stretched | single_grasp | over)
        widen = reached & ~stretch_done
        gd_next = jnp.where(widen, grasp_dist_eff + STRETCH_INCREMENT,
                            grasp_dist_eff)
        half = gd_next / 2
        widen_left = stretch_mid + stretch_dir * half
        widen_right = stretch_mid - stretch_dir * half
        widen_targets = jnp.stack([
            widen_left.at[1].set(c.fling_height),
            widen_right.at[1].set(c.fling_height),
        ])

        # LIFT bookkeeping (simEnv.py:186-200)
        min_y = jnp.min(jnp.where(act, pos[:, 1], jnp.inf))
        clear = min_y > LIFT_CLEAR
        at_max = c.fling_height >= LIFT_MAX_HEIGHT
        lift_done = reached & (clear | at_max)
        raise_h = reached & ~lift_done
        fh_next = jnp.where(raise_h, c.fling_height + LIFT_INCREMENT,
                            c.fling_height)

        # CHECKGRASP (simEnv.py:305-307, 809-813)
        max_y = jnp.max(jnp.where(act, pos[:, 1], -jnp.inf))
        grasp_failed = max_y < GRASP_CHECK_HEIGHT

        # STABILIZE completion: max |v| < tol or step cap
        # (wait_until_stable, flex_utils.py:430-441)
        vmax = jnp.max(jnp.abs(
            jnp.where(st.active[:, None], st.velocities, 0.0)))
        stab_done = (vmax < STABLE_TOL) | (
            c.phase_step >= STABLE_MAX_STEPS)

        # dispatch on kind
        kind = ins.kind
        done = jnp.where(
            kind == MOVE, reached,
            jnp.where(kind == STRETCH, stretch_done,
                      jnp.where(kind == LIFT, lift_done,
                                jnp.where(kind == STABILIZE, stab_done,
                                          True))))
        done = done | timeout

        jumping = ((kind == CHECKGRASP) & grasp_failed) | (
            (kind == CONDJUMP) & (ins.cond > 0.5))
        next_pc = jnp.where(done, jnp.where(jumping, ins.jump, c.pc + 1), c.pc)
        terminate = c.terminate | ((kind == CHECKGRASP) & grasp_failed)

        # in-phase target update for stretch/lift
        targets = jnp.where((kind == STRETCH) & widen, widen_targets, targets)
        targets = jnp.where(
            (kind == LIFT) & raise_h,
            ins.base + ins.cd * c.grasp_dist + ins.ch * fh_next,
            targets,
        )

        # ---- servo + simulate one step (unless this was a pure jump, or a
        # STABILIZE that is already done — wait_until_stable checks the
        # velocity BEFORE stepping, flex_utils.py:434) ----------------------
        is_jump_kind = ((kind == CHECKGRASP) | (kind == CONDJUMP)
                        | (is_stab & done))
        delta_t = targets - st.picker_pos
        dd = jnp.linalg.norm(delta_t, axis=1, keepdims=True)
        move = jnp.where(dd < ins.speed, delta_t,
                         delta_t / jnp.maximum(dd, 1e-9) * ins.speed)
        action = jnp.concatenate([move, ins.grasp[:, None]], axis=1)

        def do_sim(s):
            s = picker_step(s, action, dt=params.dt)
            return solver_step(
                s, topo, params, substeps=substeps, iterations=iterations,
                self_collision=self_collision, spring_mode=spring_mode,
                contact_mode=contact_mode,
                contact_every=contact_every,
                contact_iterations=contact_iterations,
                contact_window=contact_window, backend=backend, aero=aero)

        st = jax.lax.cond(is_jump_kind, lambda s: s, do_sim, st)

        frames, frame_idx = c.frames, c.frame_idx
        if record_frames > 0:
            rec = (~is_jump_kind & (c.total_steps % record_every == 0)
                   & (frame_idx < record_frames))
            slot = jnp.where(rec, frame_idx, record_frames)
            frames = frames.at[slot].set(st.positions, mode="drop")
            frame_idx = frame_idx + rec.astype(jnp.int32)

        return _Carry(
            state=st,
            pc=next_pc,
            phase_step=jnp.where(done, 0, c.phase_step + 1),
            total_steps=c.total_steps + jnp.where(is_jump_kind, 0, 1),
            targets=targets,
            grasp_dist=gd_next,
            fling_height=fh_next,
            stretch_mid=stretch_mid,
            stretch_dir=stretch_dir,
            cloth_mid=jnp.where((kind == STRETCH) & reached, new_mid,
                                cloth_mid),
            stable_steps=jnp.where((kind == STRETCH) & reached,
                                   stable_next, stable),
            terminate=terminate,
            frames=frames,
            frame_idx=frame_idx,
        )

    return body


def init_program_carry(
    state: ClothState,
    init_grasp_dist,
    init_fling_height,
    record_frames: int = 0,
) -> _Carry:
    """Fresh interpreter carry for a program about to run."""
    return _Carry(
        state=state,
        pc=jnp.int32(0),
        phase_step=jnp.int32(0),
        total_steps=jnp.int32(0),
        targets=state.picker_pos,
        grasp_dist=jnp.float32(init_grasp_dist),
        fling_height=jnp.float32(init_fling_height),
        stretch_mid=jnp.zeros(3, jnp.float32),
        stretch_dir=jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        cloth_mid=jnp.full(3, jnp.inf, jnp.float32),
        stable_steps=jnp.int32(0),
        terminate=jnp.bool_(False),
        frames=jnp.zeros(
            (record_frames, state.num_particles, 3), jnp.float32),
        frame_idx=jnp.int32(0),
    )


def run_program(
    state: ClothState,
    topo,
    params: SolverParams,
    program: Program,
    init_grasp_dist,
    init_fling_height,
    *,
    max_steps: int = 4000,
    substeps: int = 4,
    iterations: int = 30,
    self_collision: bool = True,
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_every: int = 1,
    contact_iterations: int = 8,
    contact_window: int = 16,
    backend: str = "xla",
    record_frames: int = 0,
    record_every: int = 8,
    aero: bool = False,
):
    """Execute a primitive program as ONE while_loop; returns
    (state, terminate_flag) plus, when record_frames > 0, (frames
    (F, cap, 3), n_frames): particle snapshots every `record_every` sim
    steps — the episode-video capture the reference does inside movep
    (simEnv.py:764-768), decimated."""
    num_instr = program.num_instructions
    body = _make_body(
        topo, params, program, substeps=substeps, iterations=iterations,
        self_collision=self_collision, spring_mode=spring_mode,
        contact_mode=contact_mode, contact_every=contact_every,
        contact_iterations=contact_iterations,
        contact_window=contact_window,
        backend=backend, record_frames=record_frames,
        record_every=record_every, aero=aero)

    def cond(c: _Carry):
        return (c.pc < num_instr) & (c.total_steps < max_steps)

    init = init_program_carry(state, init_grasp_dist, init_fling_height,
                              record_frames)
    out = jax.lax.while_loop(cond, body, init)
    if record_frames > 0:
        return out.state, out.terminate, out.frames, out.frame_idx
    return out.state, out.terminate


def program_chunk(
    carry: _Carry,
    topo,
    params: SolverParams,
    program: Program,
    *,
    chunk_steps: int = 256,
    max_steps: int = 4000,
    substeps: int = 4,
    iterations: int = 30,
    self_collision: bool = True,
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_every: int = 1,
    contact_iterations: int = 8,
    contact_window: int = 16,
    backend: str = "xla",
    record_frames: int = 0,
    record_every: int = 8,
    aero: bool = False,
    loop: str = "while",
):
    """Run at most `chunk_steps` interpreter iterations of `program`.

    Returns (carry', done): the host loops `carry, done = chunk(carry)`
    until done.  Bounding the work per device call keeps each launch well
    under the TPU runtime's per-call limits (the round-2 worker kernel
    fault on long vmapped programs), at the cost of one scalar readback
    per chunk.

    loop="scan": the chunk runs as a STATIC-trip-count lax.scan with a
    per-step done-mask instead of a while_loop.  Semantically identical
    (a vmapped while_loop already executes every lane each trip and masks
    finished lanes; the scan makes the masking explicit), but the static
    trip count lets XLA schedule the loop body without the per-trip
    condition reduction — a TPU throughput candidate (perf_probe_r5)."""
    num_instr = program.num_instructions
    body = _make_body(
        topo, params, program, substeps=substeps, iterations=iterations,
        self_collision=self_collision, spring_mode=spring_mode,
        contact_mode=contact_mode, contact_every=contact_every,
        contact_iterations=contact_iterations,
        contact_window=contact_window,
        backend=backend, record_frames=record_frames,
        record_every=record_every, aero=aero)

    def base_cond(c: _Carry):
        return (c.pc < num_instr) & (c.total_steps < max_steps)

    if loop == "scan":
        def sbody(c, _):
            run = base_cond(c)
            c2 = body(c)
            c_next = jax.tree_util.tree_map(
                lambda old, new: jnp.where(run, new, old), c, c2)
            return c_next, None

        out, _ = jax.lax.scan(sbody, carry, None, length=chunk_steps)
        return out, ~base_cond(out)

    def cond2(t):
        c, local = t
        return base_cond(c) & (local < chunk_steps)

    def body2(t):
        c, local = t
        return body(c), local + 1

    out, _ = jax.lax.while_loop(cond2, body2, (carry, jnp.int32(0)))
    return out, ~base_cond(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "primitive", "cfg", "substeps", "iterations", "self_collision",
        "spring_mode", "contact_mode", "contact_every",
        "contact_iterations", "contact_window", "backend",
    ),
)
def execute_primitive(
    state: ClothState,
    topo,
    params: SolverParams,
    primitive: str,
    p1,
    p2,
    p1_grasp,
    p2_grasp,
    cfg: PrimitiveConfig = PrimitiveConfig(),
    substeps: int = 4,
    iterations: int = 30,
    self_collision: bool = True,
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_every: int = 1,
    contact_iterations: int = 8,
    contact_window: int = 16,
    backend: str = "xla",
):
    """Build + run one primitive program.  Returns (state, terminated)."""
    prog, init_fh = PROGRAM_BUILDERS[primitive](
        p1, p2, p1_grasp, p2_grasp, cfg)
    dist = jnp.linalg.norm(jnp.asarray(p1) - jnp.asarray(p2))
    return run_program(
        state, topo, params, prog, dist, init_fh,
        max_steps=cfg.max_program_steps, substeps=substeps,
        iterations=iterations, self_collision=self_collision,
        spring_mode=spring_mode, contact_mode=contact_mode,
        contact_every=contact_every,
        contact_iterations=contact_iterations,
        contact_window=contact_window, backend=backend,
    )
