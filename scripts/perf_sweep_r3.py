"""Round-3 perf sweep (VERDICT item 5): find the fastest solver config
whose quality holds.

For each candidate config: measure (a) bench throughput (env-steps/s at
--num_envs), (b) static stiffness = max stretch-edge length of a hanging
cloth after 60 frames (the Chebyshev-vs-GS convergence proxy from
tests/test_solver.py).  Fling QA on the shortlist runs separately via
eval_quality.py.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sweep_r3.py
"""
import argparse
import itertools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.engine.topology import (
    build_grid_topology, grid_positions, grid_spring_edges)

DIM = 100
ENVS = 512


def flat_state(dim, height=0.005, hang=False):
    pos = grid_positions(dim, dim, lower=(0.0, height, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    n = dim * dim
    st = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
    if hang:
        im = st.inv_mass.at[0].set(0.0)
        st = st.replace(inv_mass=im, rest_inv_mass=im)
    return st


def bench_config(topo, params, batch, *, steps=10, **kw):
    fn = jax.jit(jax.vmap(lambda s: solver_step(
        s, topo, params, backend="pallas", spring_mode="chebyshev", **kw)))
    batch = fn(batch)
    jax.block_until_ready(batch.positions)
    t0 = time.perf_counter()
    for _ in range(steps):
        batch = fn(batch)
    jax.block_until_ready(batch.positions)
    return ENVS * steps / (time.perf_counter() - t0)


def stretch_config(topo, params, *, frames=60, **kw):
    st = flat_state(DIM, height=0.5, hang=True)
    fn = jax.jit(lambda s: solver_step(
        s, topo, params, backend="pallas", spring_mode="chebyshev",
        self_collision=kw.get("self_collision", True),
        iterations=kw["iterations"],
        contact_iterations=kw.get("contact_iterations", 8),
        contact_every=kw.get("contact_every", 2),
        contact_window=kw.get("contact_window", 16)))
    for _ in range(frames):
        st = fn(st)
    p = np.asarray(st.positions)
    edges, _, cls = grid_spring_edges(DIM, DIM)
    e = edges[cls == 0]
    return float(np.linalg.norm(p[e[:, 0]] - p[e[:, 1]], axis=1).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="30,24,20,16,12,10",
                    help="comma list of Chebyshev iteration counts to sweep")
    ap.add_argument("--contacts", default="8:16,6:12,4:12",
                    help="comma list of contact_iterations:window pairs")
    args = ap.parse_args()
    iters_list = tuple(int(s) for s in args.iters.split(","))
    contact_list = tuple(tuple(int(v) for v in s.split(":"))
                         for s in args.contacts.split(","))

    topo = build_grid_topology(DIM, DIM, max_dimx=DIM, max_dimy=DIM)
    params = SolverParams()
    st = flat_state(DIM)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (ENVS,) + x.shape), st)

    configs = []
    for iters, (c_it, c_win) in itertools.product(iters_list, contact_list):
        configs.append(dict(iterations=iters, contact_iterations=c_it,
                            contact_window=c_win, contact_every=2,
                            self_collision=True))

    results = []
    for cfg in configs:
        try:
            rate = bench_config(topo, params, batch, **cfg)
            stretch = stretch_config(topo, params, **cfg)
        except Exception as e:
            print(json.dumps({"cfg": cfg, "error": str(e)}), flush=True)
            raise
        row = {"cfg": cfg, "env_steps_per_s": round(rate, 1),
               "hang_stretch": round(stretch, 4)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print("BEST_BY_RATE:")
    for r in sorted(results, key=lambda r: -r["env_steps_per_s"])[:5]:
        print(json.dumps(r))

    # rho sweep at the stiffest fast config — chebyshev_rho is a RUNTIME
    # SolverParams leaf, so these rows share one compiled program
    best = min((r for r in results
                if r["cfg"]["iterations"] <= 16), default=None,
               key=lambda r: r["hang_stretch"])
    if best is not None:
        cfg = dict(best["cfg"])
        for rho in (0.97, 0.98, 0.985, 0.992, 0.996):
            p = SolverParams(chebyshev_rho=jnp.float32(rho))
            stretch = stretch_config(topo, p, **cfg)
            print(json.dumps({"rho": rho, "cfg": cfg,
                              "hang_stretch": round(stretch, 4)}),
                  flush=True)


if __name__ == "__main__":
    main()
