"""Mesh-cloth (shirt) path end-to-end: OBJ -> task -> SimEnv episode.

The flingbot-shirt eval set stores Cloth3D quad meshes in its HDF5 tasks
(reference tasks.py:131-142); here we exercise the same pipeline with a
synthetic quad mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from flingbot_tpu.env.tasks import (
    TaskLoader,
    generate_randomization,
    write_task,
)
from flingbot_tpu.env.sim_env import SimEnv
from flingbot_tpu.learning.nets import MaximumValuePolicy
from tests.test_native import write_quad_obj

MESH_CAPS = (512, 8192, 1024)


@pytest.fixture(scope="module")
def mesh_task_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshes")
    write_quad_obj(d / "shirt_processed.obj", nx=14, ny=12)
    # scale mesh to cloth-like size: rewrite with 0.01 spacing placed low
    path = str(d / "shirt_processed.obj")
    lines = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                x, y, z = (float(v) for v in line.split()[1:])
                lines.append(f"v {x * 0.15} {y + 0.05} {z * 0.15}\n")
            else:
                lines.append(line)
    with open(path, "w") as f:
        f.writelines(lines)

    task_path = str(tmp_path_factory.mktemp("tasks") / "shirt_tasks.hdf5")
    rng = np.random.default_rng(0)
    task = None
    while task is None:
        task = generate_randomization(
            rng, cloth_type="mesh", cloth_mesh_path=str(d),
            task_difficulty="hard", mesh_caps=MESH_CAPS,
        )
    write_task(task_path, task)
    return task_path


class TestMeshTask:
    def test_mesh_task_roundtrip(self, mesh_task_file):
        loader = TaskLoader(mesh_task_file)
        task = loader.get_next_task()
        assert task.mesh_verts.size > 0
        assert (task.cloth_size == [-1, -1]).all()
        assert task.mesh_stretch_edges.size > 0
        assert task.mesh_bend_edges.size > 0
        assert task.mesh_shear_edges.size > 0

    def test_mesh_episode(self, mesh_task_file, tmp_path):
        loader = TaskLoader(mesh_task_file)
        env = SimEnv(
            get_task_fn=loader.get_next_task,
            replay_buffer_path=str(tmp_path / "replay.hdf5"),
            obs_dim=64,
            num_rotations=2,
            scale_factors=[1.0],
            action_primitives=["fling"],
            episode_length=1,
            render_dim=128,
            mesh_caps=MESH_CAPS,
        )
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=64)
        obs = env.reset()
        assert obs.shape == (2, 4, 64, 64)
        # one full step on the mesh path (episode_length=1 -> auto reset)
        obs2 = env.step(policy.value_maps(obs))
        assert obs2.shape == (2, 4, 64, 64)
        import h5py
        with h5py.File(str(tmp_path / "replay.hdf5"), "r") as f:
            assert len(f) >= 1
