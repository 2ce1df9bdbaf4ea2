"""Per-stage solver profiling — the NvFlexTimers analog.

The reference solver exposes per-stage GPU timers (predict, grid build,
collide, solveSprings, solveContacts, applyDeltas, finalize;
NvFlexGetTimers, reference PyFlex/include/NvFlex.h:197-223) plus a demo
benchmark harness (PyFlex/bindings/benchmark.h).  Here the stages are our
own jitted functions, so profiling is wall-clock timing of each compiled
stage plus `jax.profiler` trace capture for op-level breakdowns.

Usage:
    report = profile_solver_stages(num_envs=64, dim=100)
    print(format_report(report))

    with trace("/tmp/jax-trace"):   # view in xprof/tensorboard
        step_fn(state)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time_fn(fn, args, iters: int) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def profile_solver_stages(num_envs: int = 64, dim: int = 100,
                          iters: int = 5) -> Dict[str, float]:
    """Times the solver's pipeline stages (seconds per batched step)."""
    import jax
    import jax.numpy as jnp

    from flingbot_tpu.engine import collisions, solver
    from flingbot_tpu.engine.state import ClothState, SolverParams
    from flingbot_tpu.engine.topology import (
        build_grid_topology, grid_positions)

    pos = grid_positions(dim, dim, lower=(0.0, 0.005, 0.0))
    n = dim * dim
    state = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
    topo = build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)
    params = SolverParams()
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), state)

    report = {}

    def springs(s):
        Pl, valid = solver.gather_to_lattice(s.positions, topo)
        wl, _ = solver.gather_to_lattice(s.inv_mass, topo)
        body = lambda _, P: solver.solve_springs_grid(
            P, wl, valid, topo, params.relaxation_factor, "gs")
        return jax.lax.fori_loop(0, 120, body, Pl)

    report["solveSprings (4x30 iters)"] = _time_fn(
        jax.jit(jax.vmap(springs)), (batch,), iters)

    def sort_stage(s):
        Pl, valid = solver.gather_to_lattice(s.positions, topo)
        return collisions.sweep_order(
            Pl.reshape(3, -1), valid.reshape(-1), params.radius)

    report["grid build (morton sort)"] = _time_fn(
        jax.jit(jax.vmap(sort_stage)), (batch,), iters)

    def contacts(s):
        Pl, valid = solver.gather_to_lattice(s.positions, topo)
        wl, _ = solver.gather_to_lattice(s.inv_mass, topo)
        perm, inv = collisions.sweep_order(
            Pl.reshape(3, -1), valid.reshape(-1), params.radius)
        return collisions.solve_contacts_sweep(
            Pl, wl, valid, perm, inv, params, rest_dist=params.radius,
            lattice_w=dim, prev=Pl)

    report["solveContacts (8 iters)"] = _time_fn(
        jax.jit(jax.vmap(contacts)), (batch,), iters)

    for backend in ("xla", "pallas"):
        try:
            fn = jax.jit(jax.vmap(
                lambda s: solver.step(s, topo, params, backend=backend)))
            report[f"full step [{backend}]"] = _time_fn(fn, (batch,), iters)
        except Exception as e:  # pragma: no cover
            report[f"full step [{backend}]"] = float("nan")
            print(f"backend {backend} failed: {e}")
    return report


def format_report(report: Dict[str, float], num_envs: int = 64) -> str:
    lines = ["stage                          ms/call   env-steps/s"]
    for k, v in report.items():
        rate = num_envs / v if v == v and v > 0 else float("nan")
        lines.append(f"{k:<30} {v * 1e3:8.2f}   {rate:10.0f}")
    return "\n".join(lines)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--dim", type=int, default=100)
    a = p.parse_args()
    rep = profile_solver_stages(a.num_envs, a.dim)
    print(format_report(rep, a.num_envs))
