"""Behavioral friction-calibration parity suite (VERDICT r4 item 2).

FleX applies shape friction once per solver step (NvFlexParams
.dynamicFriction, NvFlex.h:105, scene constant 0.75 at
softgym_cloth.h:164); this engine's Coulomb plane projection runs once
per CONTACT PASS (contact_iterations x substeps/contact_every per step),
so a numerically-equal mu over-brakes sliding.  The right parity target
is BEHAVIOR, measured by three observables per candidate mu:

1. fling-slide distance: a flat 100x100 cloth given a uniform horizontal
   velocity; settled center-of-mass displacement -> effective rigid-slab
   Coulomb mu_eff = v0^2 / (2 g d).  This maps OUR per-pass mu onto the
   physically meaningful friction scale FleX's 0.75 lives on.
2. drop-crumple grade: init/flatten coverage ratio of freshly generated
   hard tasks (reference grade ~0.33, round-1 sequential set 0.32) —
   friction at landing must still crumple, not let the cloth skate flat.
3. hanging stretch: max structural-edge length of a pinned hanging cloth
   (friction-independent spring-stiffness control — must not move).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/parity_suite.py \
      --out runs/round5/parity_suite.jsonl
CPU smoke: JAX_PLATFORMS=cpu ... --platform cpu --dim 32 --tasks_per_mu 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mus", default="0.75,0.4,0.25,0.1")
    p.add_argument("--dim", type=int, default=100)
    p.add_argument("--v0s", default="1.0,2.0")
    p.add_argument("--tasks_per_mu", type=int, default=16)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--backend", default="pallas")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from flingbot_tpu.engine.solver import step as solver_step
    from flingbot_tpu.engine.state import ClothState, SolverParams
    from flingbot_tpu.engine.topology import (
        build_grid_topology, grid_positions, grid_spring_edges)

    dim = args.dim
    topo = build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)
    sim_kw = dict(backend=args.backend, spring_mode="chebyshev",
                  substeps=4, iterations=16, contact_every=2,
                  contact_iterations=4, contact_window=12)

    def flat_state(height=0.006, hang=False):
        pos = grid_positions(dim, dim, lower=(0.0, height, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        n = dim * dim
        st = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
        if hang:
            im = st.inv_mass.at[0].set(0.0)
            st = st.replace(inv_mass=im, rest_inv_mass=im)
        return st

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

    g = 9.8
    # params as a traced ARGUMENT: one compile serves every mu (leaves are
    # runtime scalars; a closed-over params bakes mu into the HLO and
    # recompiles per row — ~4 min/compile through the tunnel)
    step_jit = jax.jit(lambda s, pp: solver_step(s, topo, pp, **sim_kw))
    for mu in (float(m) for m in args.mus.split(",")):
        params = SolverParams(dynamic_friction=jnp.float32(mu))
        step_fn = lambda s, pp=params: step_jit(s, pp)

        # --- 1. fling-slide -> mu_eff ---------------------------------
        slide = {}
        for v0 in (float(v) for v in args.v0s.split(",")):
            st = flat_state()
            st = st.replace(velocities=st.velocities.at[:, 0].set(v0))
            x0 = float(np.asarray(st.positions[:, 0]).mean())
            t0 = time.time()
            # chunked host loop with a velocity stop test (TPU per-call
            # wall-time discipline: ~30 steps/call at dim 100)
            for _ in range(40):
                for _ in range(20):
                    st = step_fn(st)
                vmax = float(np.abs(np.asarray(st.velocities)).max())
                if vmax < 5e-3:
                    break
            x1 = float(np.asarray(st.positions[:, 0]).mean())
            d = x1 - x0
            mu_eff = v0 * v0 / (2 * g * max(d, 1e-6))
            slide[str(v0)] = {
                "slide_m": round(d, 4), "mu_eff": round(mu_eff, 4),
                "settled": vmax < 5e-3, "seconds": round(time.time() - t0, 1)}

        # --- 2. drop-crumple grade ------------------------------------
        from flingbot_tpu.env.tasks import TaskLoader, generate_tasks_batch

        tmp = tempfile.mktemp(suffix=f"_mu{mu}.hdf5")
        t0 = time.time()
        generate_tasks_batch(
            tmp, args.tasks_per_mu, batch=args.tasks_per_mu, seed=7,
            min_cloth_size=min(64, dim - 1), max_cloth_size=dim,
            strict_min_edge_length=min(64, dim), task_difficulty="hard",
            max_grid_dim=dim, log=False, solver_params=params)
        loader = TaskLoader(tmp)
        ratios = []
        for _ in range(len(loader)):
            s = loader.get_next_task().get_stats()
            ratios.append(s["init_coverage"] / max(s["max_coverage"], 1e-9))
        crumple = {"ratio_mean": round(float(np.mean(ratios)), 4),
                   "ratio_min": round(float(np.min(ratios)), 4),
                   "ratio_max": round(float(np.max(ratios)), 4),
                   "n": len(ratios),
                   "seconds": round(time.time() - t0, 1)}
        os.unlink(tmp)

        # --- 3. hanging stretch (control) -----------------------------
        st = flat_state(height=0.5, hang=True)
        for _ in range(60):
            st = step_fn(st)
        pos = np.asarray(st.positions)
        edges, _, cls = grid_spring_edges(dim, dim)
        e = edges[cls == 0]
        stretch = float(np.linalg.norm(
            pos[e[:, 0]] - pos[e[:, 1]], axis=1).max())

        emit({"mu": mu, "fling_slide": slide, "drop_crumple": crumple,
              "hang_stretch_max_edge": round(stretch, 5)})

    print(json.dumps({"done": True, "rows": len(rows)}))


if __name__ == "__main__":
    main()
