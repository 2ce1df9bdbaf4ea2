"""Measure the MESH (shirt) solver's per-step cost on real TPU with short,
escalating device calls — the round-4 bisect for the 2026-08-18 worker
kernel fault (shirt eval, 192-step chunks at batch 16).

Two hypotheses the crash left open:
  (a) wall time: mesh steps are slow enough that a rect-tuned 192-step
      chunk exceeds the ~50-80 s per-call limit that kernel-faults the
      worker (CLAUDE.md), or
  (b) a genuine Mosaic bug in the mesh pallas path at production shapes
      (it was only ever validated in interpret mode on CPU).

This probe distinguishes them in under ~3 min of chip time: it times
jitted scans of k solver steps for k in 1, 4, 16 at batch 2 then 16,
aborting the escalation if the projected next call would exceed 25 s.
If even k=1 faults -> (b).  If timings extrapolate past ~50 s at 192
steps -> (a), and the printed per-step ms gives the safe chunk length.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mesh_tpu.py \
      [--tasks data_r3/shirt_eval_16.hdf5] [--backend pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", default="data_r3/shirt_eval_16.hdf5")
    p.add_argument("--backend", default="pallas")
    p.add_argument("--layout", default="mesh", choices=("mesh", "layered"),
                   help="'layered' = the stencil shirt path "
                        "(LayeredGridTopology) instead of the gather path")
    p.add_argument("--limit_s", type=float, default=25.0)
    p.add_argument("--trace_only", action="store_true",
                   help="jax.eval_shape the probe program (CPU smoke test; "
                        "no execution)")
    args = p.parse_args()

    from flingbot_tpu.engine.state import SolverParams
    from flingbot_tpu.engine.solver import step as solver_step
    from flingbot_tpu.env.scene import set_scene
    from flingbot_tpu.env.tasks import (TaskLoader, detect_layered_spec,
                                        detect_mesh_caps)

    loader = TaskLoader(args.tasks)
    task = loader.get_next_task()
    if args.layout == "layered":
        spec = detect_layered_spec(args.tasks)
        assert spec is not None, "task file is not layered-representable"
        print(f"[probe_mesh] layered spec: H={spec.H} W={spec.W} "
              f"K={len(spec.offsets)}", flush=True)
        scene = set_scene(task.get_config(), task.get_state(),
                          layered_spec=spec)
    else:
        caps = detect_mesh_caps(args.tasks)
        scene = set_scene(task.get_config(), task.get_state(),
                          mesh_caps=caps)
    params = SolverParams()
    # production mesh config (eval_all_r3.sh): chebyshev springs 4x16,
    # sorted-window contacts 4 iters / window 12 / every 2nd substep
    sim_kw = dict(self_collision=True, spring_mode="chebyshev",
                  contact_mode="sort", contact_every=2,
                  contact_iterations=4, contact_window=12,
                  backend=args.backend, substeps=4, iterations=16)

    def steps_fn(state, topo, k):
        step1 = jax.vmap(lambda s, t: solver_step(s, t, params, **sim_kw))

        def body(s, _):
            return step1(s, topo), None

        return jax.lax.scan(body, state, None, length=k)[0]

    for batch in (2, 16):
        state = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch), scene.state)
        topo = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch), scene.topo)
        if args.trace_only:
            out = jax.eval_shape(lambda s, t: steps_fn(s, t, 1), state, topo)
            print(json.dumps({"batch": batch, "trace_only": True,
                              "out_positions": list(out.positions.shape)}),
                  flush=True)
            continue
        per_step_ms = None
        for k in (1, 4, 16):
            if per_step_ms is not None \
                    and per_step_ms * k * 1e-3 > args.limit_s:
                print(f"[probe_mesh] batch {batch}: skipping k={k} "
                      f"(projected > {args.limit_s}s/call)", flush=True)
                break
            fn = jax.jit(lambda s, t, _k=k: steps_fn(s, t, _k))
            t0 = time.time()
            out = fn(state, topo)
            jax.block_until_ready(out)
            t_compile = time.time() - t0
            t0 = time.time()
            out = fn(state, topo)
            jax.block_until_ready(out)
            dt = time.time() - t0
            per_step_ms = dt / k * 1e3
            print(json.dumps({
                "batch": batch, "k": k, "call_s": round(dt, 3),
                "per_step_ms": round(per_step_ms, 1),
                "compile_s": round(t_compile, 1),
                "safe_chunk_at_30s": int(30e3 / per_step_ms),
                "s_at_192_steps": round(per_step_ms * 192 * 1e-3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
