"""Round-3 task-set regeneration (VERDICT item 2).

Regenerates every eval set (and optionally the train set) with the fixed
maxAcceleration clamp at full counts, using chunked batched generation
(bounded device calls — the TPU worker kernel-faults past ~60-80 s per
call).  Resumable: re-running skips completed sets / tops up partial ones.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/generate_sets_r3.py \
      [--sets hard,easy,large,train] [--batch 128] [--chunk_steps 96]
"""
import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import h5py
import numpy as np

from flingbot_tpu.env.tasks import generate_tasks_batch

SETS = {
    # name: (num, difficulty, min_size, max_size, strict_min, max_grid, seed)
    "hard": ("data_r3/rect_eval_hard_100.hdf5", 100, "hard", 64, 104, 64,
             104, 100),
    "easy": ("data_r3/rect_eval_easy_64.hdf5", 64, "easy", 64, 104, 64,
             104, 200),
    "large": ("data_r3/rect_eval_large_64.hdf5", 64, "hard", 112, 128, 112,
              128, 300),
    "train": ("data_r3/rect_train_2048.hdf5", 2048, "hard", 64, 104, 64,
              104, 400),
    # round-6: a smaller train set that gets COMMITTED (the 2048-task file
    # is gitignored and did not survive the round-4->6 boundary, costing a
    # regen; 512 tasks ~= 95 MB commits fine and 1-2k episodes/round reuse
    # each task only a handful of times).  Same generation protocol/seed
    # family as `train`.
    "train512": ("data_r3/rect_train_512.hdf5", 512, "hard", 64, 104, 64,
                 104, 400),
}


def set_stats(path):
    init, flat = [], []
    with h5py.File(path, "r") as f:
        for k in f:
            init.append(float(f[k].attrs["initial_coverage"]))
            flat.append(float(f[k].attrs["flatten_area"]))
        n = len(f)
    init = np.asarray(init)
    flat = np.asarray(flat)
    ratio = init / np.maximum(flat, 1e-9)
    return {"n": n, "init_mean": round(float(init.mean()), 4),
            "ratio_mean": round(float(ratio.mean()), 4),
            "ratio_max": round(float(ratio.max()), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", default="hard,easy,large,train")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk_steps", type=int, default=96)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--contact_mode", default="sort")
    ap.add_argument("--gen_fric", type=float, default=None,
                    help="dynamic_friction during task GENERATION "
                         "(default: the production SolverParams default; "
                         "pass 0.75 to hold the FleX-scene crumpling "
                         "regime if the calibrated mu under-crumples — "
                         "see runs/round5b/parity_suite.jsonl)")
    a = ap.parse_args()
    gen_params = None
    if a.gen_fric is not None:
        from flingbot_tpu.engine.state import SolverParams
        import jax.numpy as jnp

        gen_params = SolverParams(dynamic_friction=jnp.float32(a.gen_fric))
    os.makedirs("data_r3", exist_ok=True)

    for name in a.sets.split(","):
        if name == "shirt":
            from flingbot_tpu.env.tasks import generate_tasks

            path = "data_r3/shirt_eval_16.hdf5"
            print(f"=== shirt: 16 mesh tasks -> {path}", flush=True)
            generate_tasks(
                path, 16, seed=500, task_difficulty="hard",
                cloth_type="mesh", cloth_mesh_path="data/shirts")
            print(f"[shirt] {json.dumps(set_stats(path))}", flush=True)
            continue
        path, num, diff, mins, maxs, strict, grid, seed = SETS[name]
        batch = min(a.batch, max(32, num))
        print(f"=== {name}: {num} {diff} tasks -> {path} "
              f"(batch {batch}, chunk {a.chunk_steps})", flush=True)
        # NOTE: a TPU worker fault poisons this process's client — recovery
        # is process-level.  Run under scripts/retry.sh (re-exec + cooldown);
        # generation is resumable so nothing is lost.
        generate_tasks_batch(
            path, num, batch=batch, seed=seed,
            min_cloth_size=mins, max_cloth_size=maxs,
            strict_min_edge_length=strict, task_difficulty=diff,
            max_grid_dim=grid, backend=a.backend,
            spring_mode="gs", contact_mode=a.contact_mode,
            contact_every=2, chunk_steps=a.chunk_steps,
            solver_params=gen_params)
        stats = set_stats(path)
        print(f"[{name}] {json.dumps(stats)}", flush=True)
    print("ALL_SETS_DONE", flush=True)


if __name__ == "__main__":
    main()
