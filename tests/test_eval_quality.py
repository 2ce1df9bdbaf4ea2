"""End-to-end smoke of the eval CLI (eval_quality.py) on CPU.

Exercises the full path the round evals depend on: TaskLoader -> chunked
BatchSimEnv -> random/heuristic value maps -> coverage stats JSON.  Runs
on tiny cloths via the shared task fixture; the JAX_PLATFORMS override in
eval_quality.py (sitecustomize pre-imports jax with the axon platform)
is what makes this possible at all."""

import json
import os
import subprocess
import sys

import pytest

from tests.test_sim_env import MAX_DIM, task_file  # fixture reuse  # noqa


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["random", "heuristic"])
def test_eval_quality_cli(task_file, policy):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "/root/repo/eval_quality.py",
         "--tasks", task_file, "--policy", policy,
         "--steps", "1", "--num_envs", "1",
         "--max_grid_dim", str(MAX_DIM), "--render_dim", "128",
         "--backend", "xla", "--spring_mode", "chebyshev",
         "--iterations", "8", "--exec_mode", "chunked",
         "--chunk_steps", "32", "--episodes", "1"],
        env=env, capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    stats = json.loads(last)
    assert stats["episodes"] == 1
    assert any(k.startswith("final_coverage/") for k in stats)
