"""Round-5 perf probe: per-stage solver timings + sort-payload
micro-benchmarks at the production operating point (512 envs, 100x100),
feeding the PERF.md lever decisions (VERDICT r4 weak #1).

Rows (JSONL):
  step_iters{16,12,10}    full production step at that iteration count
  substeps_only           one pallas_substeps launch (2 sub x 16 iters)
  contact_group           full sort->kernel->inverse-sort pass
  sort_fwd_k{8,6,4}       multi-operand lax.sort with that many operands
  sort_fwd_i16            6-operand sort with int16 keys
  sort_inv_k{4,2}         inverse sort payload widths

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/perf_probe_r5.py --out runs/round5b/perf_probe.jsonl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--dim", type=int, default=100)
    p.add_argument("--platform", default=None)
    p.add_argument("--rows", default=None,
                   help="comma-separated row-name substrings to run "
                        "(default: all)")
    args = p.parse_args()
    row_pats = ([s.strip() for s in args.rows.split(",") if s.strip()]
                if args.rows else None)

    def want(name):
        return row_pats is None or any(pat in name for pat in row_pats)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from flingbot_tpu.engine.solver import step as solver_step
    from flingbot_tpu.engine.state import ClothState, SolverParams
    from flingbot_tpu.engine.topology import build_grid_topology, grid_positions

    B, dim = args.envs, args.dim
    n = dim * dim
    pos = grid_positions(dim, dim, lower=(0.0, 0.005, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    st = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
    topo = build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), st)
    params = SolverParams()

    rows = []

    def emit(name, sec):
        row = {"name": name, "ms_per_frame": round(sec * 1e3, 2),
               "env_steps_per_s": round(B / sec, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

    # --- full production step at iteration counts ------------------------
    for iters in (16, 12, 10):
        if not want(f"step_iters{iters}"):
            continue
        fn = jax.jit(jax.vmap(lambda s: solver_step(
            s, topo, params, backend="pallas", spring_mode="chebyshev",
            substeps=4, iterations=iters, contact_every=2,
            contact_iterations=4, contact_window=12)))
        emit(f"step_iters{iters}", timeit(fn, batch))

    # --- dynamic-dims grid (the TRAINING distribution: dimx 64-104 padded
    # to the 104 lattice, full_grid=False -> per-step lattice<->canonical
    # conversion; the probe topo above is full_grid and skips it)
    if want("step_dynamic_grid"):
        dtopo = build_grid_topology(dim, dim, max_dimx=104, max_dimy=104)
        dstate = ClothState.create(
            np.concatenate([pos, np.zeros((104 * 104 - n, 3), np.float32)]),
            np.concatenate([np.full(n, n / 0.5, np.float32),
                            np.zeros(104 * 104 - n, np.float32)]))
        dstate = dstate.replace(active=jnp.arange(104 * 104) < n)
        dbatch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * B), dstate)
        fn = jax.jit(jax.vmap(lambda s: solver_step(
            s, dtopo, params, backend="pallas", spring_mode="chebyshev",
            substeps=4, iterations=16, contact_every=2,
            contact_iterations=4, contact_window=12)))
        emit("step_dynamic_grid", timeit(fn, dbatch))

    # --- loop-structure isolation (the training program runs its solver
    # steps inside a lax.while_loop; bench uses a python dispatch loop —
    # if these differ, the gap is XLA loop overhead, not the interpreter)
    def scan_steps(s, k):
        def body(st, _):
            return solver_step(
                st, topo, params, backend="pallas",
                spring_mode="chebyshev", substeps=4, iterations=16,
                contact_every=2, contact_iterations=4,
                contact_window=12), None
        return jax.lax.scan(body, s, None, length=k)[0]

    K = 24
    if want(f"scan{K}_raw_step"):
        scan_fn = jax.jit(jax.vmap(lambda s: scan_steps(s, K)))
        sec = timeit(scan_fn, batch, steps=2) / K
        emit(f"scan{K}_raw_step", sec)

    # full interpreter chunk (program_chunk on a mid-fling MOVE phase)
    from flingbot_tpu.env.primitives import (
        PROGRAM_BUILDERS, PrimitiveConfig, init_program_carry,
        program_chunk)

    cfg = PrimitiveConfig()
    prog, init_fh = PROGRAM_BUILDERS["fling"](
        jnp.asarray([0.2, 0.02, -0.2]), jnp.asarray([-0.2, 0.02, -0.2]),
        jnp.bool_(True), jnp.bool_(True), cfg)
    carry = jax.vmap(lambda s: init_program_carry(
        s, jnp.float32(0.4), init_fh, 0))(batch)
    prog_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), prog)
    topo_b = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * B) if hasattr(x, "ndim") else x, topo)
    if want(f"chunk{K}_interpreter_step"):
        chunk_fn = jax.jit(jax.vmap(functools.partial(
            program_chunk, chunk_steps=K, max_steps=4000,
            substeps=4, iterations=16, self_collision=True,
            spring_mode="chebyshev", contact_mode="sort", contact_every=2,
            contact_iterations=4, contact_window=12, backend="pallas"),
            in_axes=(0, 0, None, 0)))
        sec = timeit(lambda: chunk_fn(carry, topo_b, params, prog_b),
                     steps=2) / K
        emit(f"chunk{K}_interpreter_step", sec)

    if want(f"chunk{K}_interpreter_scan_step"):
        chunk_scan = jax.jit(jax.vmap(functools.partial(
            program_chunk, chunk_steps=K, max_steps=4000,
            substeps=4, iterations=16, self_collision=True,
            spring_mode="chebyshev", contact_mode="sort", contact_every=2,
            contact_iterations=4, contact_window=12, backend="pallas",
            loop="scan"), in_axes=(0, 0, None, 0)))
        sec = timeit(lambda: chunk_scan(carry, topo_b, params, prog_b),
                     steps=2) / K
        emit(f"chunk{K}_interpreter_scan_step", sec)

    # --- stage isolation --------------------------------------------------
    from flingbot_tpu.engine.pallas_kernels import (
        pack_sub_params, pallas_substeps)

    H, W = topo.max_dimy, topo.max_dimx
    from flingbot_tpu.engine.solver import gather_to_lattice

    Pl, valid = gather_to_lattice(st.positions, topo)
    wl, _ = gather_to_lattice(st.inv_mass, topo)
    Pb = jnp.stack([Pl] * B)
    Vb = jnp.zeros_like(Pb)
    wb = jnp.stack([wl] * B)
    pvec = pack_sub_params(params, topo, st.picker_pos, 0.02,
                           params.dt / 4, 0.992)
    pvb = jnp.stack([pvec] * B)
    interp = jax.default_backend() == "cpu"
    if want("substeps_only_2x16"):
        # vmapped like production (_step_grid_pallas runs B=1 kernels
        # under the env vmap; a direct B=512 call trips the SMEM
        # blockspec divisibility rule)
        sub_fn = jax.jit(jax.vmap(lambda pv, P, V, w: [
            a[0] for a in pallas_substeps(
                pv[None], P[None], V[None], w[None], n_sub=2,
                iterations=16, cheb=True, picker_last=False,
                interpret=interp)]))
        emit("substeps_only_2x16", timeit(sub_fn, pvb, Pb, Vb, wb))

    from flingbot_tpu.engine import collisions

    flat = jnp.stack([st.positions.T] * B)  # (B, 3, N)
    act = jnp.stack([st.active] * B)
    wfl = jnp.stack([st.inv_mass] * B)
    if want("contact_group"):
        cg = jax.jit(jax.vmap(
            lambda P, prev, w, a: collisions.contact_group(
                P, prev, w, a, params, rest_dist=params.radius, lattice_w=W,
                window=12, iterations=4, backend="pallas",
                interpret=interp)))
        emit("contact_group", timeit(cg, flat, flat, wfl, act))

    # --- sort micro-benchmarks -------------------------------------------
    rng = np.random.default_rng(0)
    keys32 = jnp.asarray(rng.integers(0, 2 ** 27, (B, n)), jnp.int32)
    keys16 = keys32.astype(jnp.int16)
    payload = [jnp.asarray(rng.random((B, n)), jnp.float32)
               for _ in range(7)]
    packed = jnp.asarray(rng.integers(0, 2 ** 21, (B, n)), jnp.int32)

    def sort_n(ops):
        return jax.jit(lambda *o: jax.lax.sort(o, dimension=1, num_keys=1))(
            *ops)

    if want("sort"):
        emit("sort_fwd_k8", timeit(
            lambda: sort_n((keys32,) + tuple(payload[:6]) + (packed,))))
        emit("sort_fwd_k6", timeit(
            lambda: sort_n((keys32,) + tuple(payload[:4]) + (packed,))))
        emit("sort_fwd_k4", timeit(
            lambda: sort_n((keys32,) + tuple(payload[:2]) + (packed,))))
        emit("sort_fwd_i16", timeit(
            lambda: sort_n((keys16,) + tuple(payload[:4]) + (packed,))))
        emit("sort_inv_k4", timeit(
            lambda: sort_n((packed,) + tuple(payload[:3]))))
        emit("sort_inv_k2", timeit(
            lambda: sort_n((packed, payload[0]))))

    print(json.dumps({"done": True, "rows": len(rows)}))


if __name__ == "__main__":
    main()
