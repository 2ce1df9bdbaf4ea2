"""Task-file byte-compat proven against a REFERENCE-written fixture
(VERDICT r3 item 5).

`_reference_dump` below vendors the exact serialization semantics of the
reference generator (reference environment/tasks.py:305-320): sha1-of-count
group keys, scalars stored as group attrs via EXACT-type dispatch
(`type(v) == float / int / np.float64 / str` — note: NOT isinstance), and
every other value as a gzip-9 dataset.  The task dict layout and dtypes
replicate what pyflex readbacks produce (tasks.py:267-284): flat float32
particle_pos with invMass in w, flat float32 velocities, int32 phases,
float64 numpy scalars from the coverage metric, int cloth_size array,
float64 stiffness triple, flat mesh arrays (empty for rect cloths).

Loading such a file through TaskLoader -> BatchSimEnv.reset -> one step is
the compat contract the SURVEY names (flingbot-rect/shirt eval HDF5 files
run unchanged, SURVEY §0)."""

import hashlib

import h5py
import numpy as np
import pytest

from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.tasks import (
    TaskLoader,
    detect_mesh_caps,
    generate_randomization,
)
from tests.test_mesh_cloth import MESH_CAPS, mesh_task_file  # noqa: F401

# fixture cost (full crumple generation on CPU) dominates: slow suite
pytestmark = pytest.mark.slow

MAX_DIM = 32


def _reference_dump(path, task):
    """The reference's HDF5 dump, verbatim semantics (tasks.py:305-320)."""
    with h5py.File(path, "a") as file:
        key = hashlib.sha1(f"{len(file)}".encode()).hexdigest()
        group = file.create_group(key)
        for key, value in task.items():
            if type(value) == float or \
                    type(value) == int or \
                    type(value) == np.float64 or \
                    type(value) == str:
                group.attrs[key] = value
            else:
                group.create_dataset(
                    name=key,
                    data=value,
                    compression="gzip",
                    compression_opts=9)


def _as_reference_dtypes(task):
    """Coerce our generator's task dict to the dtypes the reference's
    pyflex readbacks produce, so the fixture is byte-faithful."""
    out = dict(task)
    out["particle_pos"] = np.asarray(task["particle_pos"], np.float32)
    out["particle_vel"] = np.asarray(task["particle_vel"], np.float32)
    out["shape_pos"] = np.asarray(task["shape_pos"], np.float32)
    out["phase"] = np.asarray(task["phase"], np.int32)
    # get_current_covered_area returns np.float64 in the reference
    out["initial_coverage"] = np.float64(task["initial_coverage"])
    out["flatten_area"] = np.float64(task["flatten_area"])
    out["cloth_mass"] = np.float64(task["cloth_mass"])
    out["flip_mesh"] = int(task["flip_mesh"])
    out["cloth_size"] = np.asarray(task["cloth_size"], np.int64)
    out["cloth_stiff"] = np.asarray(task["cloth_stiff"], np.float64)
    for k in ("mesh_verts", "mesh_stretch_edges", "mesh_bend_edges",
              "mesh_shear_edges", "mesh_faces"):
        v = np.asarray(task.get(k, np.array([]))).reshape(-1)
        # reference meshes parse to float64 verts / int edge indices
        out[k] = v.astype(np.float64 if k == "mesh_verts" else np.int64) \
            if v.size else np.array([])
    return out


@pytest.fixture(scope="module")
def rect_reference_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ref") / "ref_rect.hdf5")
    rng = np.random.default_rng(3)
    task = None
    while task is None:
        task = generate_randomization(
            rng, min_cloth_size=24, max_cloth_size=MAX_DIM,
            strict_min_edge_length=24, task_difficulty="hard",
            max_grid_dim=MAX_DIM)
    _reference_dump(path, _as_reference_dtypes(task))
    return path


@pytest.fixture(scope="module")
def mesh_reference_file(tmp_path_factory, mesh_task_file):  # noqa: F811
    """Rewrite the synthetic shirt task with the reference's writer."""
    loader = TaskLoader(mesh_task_file)
    t = loader.get_next_task()
    task = {
        "particle_pos": t.particle_pos, "particle_vel": t.particle_vel,
        "initial_coverage": t.initial_coverage,
        "shape_pos": t.shape_pos, "phase": t.phase,
        "flatten_area": t.flatten_area, "flip_mesh": t.flip_mesh,
        "cloth_size": np.array([-1, -1]), "cloth_stiff": t.cloth_stiff,
        "cloth_mass": t.cloth_mass, "task_difficulty": t.task_difficulty,
        "mesh_verts": t.mesh_verts, "mesh_stretch_edges": t.mesh_stretch_edges,
        "mesh_bend_edges": t.mesh_bend_edges,
        "mesh_shear_edges": t.mesh_shear_edges, "mesh_faces": t.mesh_faces,
    }
    path = str(tmp_path_factory.mktemp("ref") / "ref_shirt.hdf5")
    _reference_dump(path, _as_reference_dtypes(task))
    return path


def _run_one_step(task_path, tmp_path, mesh_caps=None):
    loader = TaskLoader(task_path)
    replay = str(tmp_path / "replay.hdf5")
    env = BatchSimEnv(
        get_task_fn=loader.get_next_task, num_envs=1,
        replay_buffer_path=replay, obs_dim=64, num_rotations=2,
        scale_factors=[1.0], action_primitives=["fling"], episode_length=1,
        render_dim=128, max_grid_dim=MAX_DIM, mesh_caps=mesh_caps,
        exec_mode="chunked", chunk_steps=32, seed=0)
    obs = env.reset()
    assert np.isfinite(np.asarray(obs)).all()
    vm = np.random.default_rng(0).uniform(
        size=(1, 1, 2, 64, 64)).astype(np.float32)
    env.step(vm)
    assert env.episodes_done == 1
    with h5py.File(replay, "r") as f:
        assert len(f) == 1
    return env


class TestReferenceWrittenFixtures:
    def test_reference_writer_schema(self, rect_reference_file):
        with h5py.File(rect_reference_file, "r") as f:
            keys = list(f)
            assert keys == [hashlib.sha1(b"0").hexdigest()]
            g = f[keys[0]]
            # scalars landed as attrs (exact-type dispatch), arrays as
            # gzip datasets — the reference's on-disk shape
            for a in ("initial_coverage", "flatten_area", "cloth_mass",
                      "flip_mesh", "task_difficulty"):
                assert a in g.attrs, a
            for d in ("particle_pos", "particle_vel", "phase", "shape_pos",
                      "cloth_size", "cloth_stiff", "mesh_verts"):
                assert d in g, d
            assert g["particle_pos"].compression == "gzip"
            assert g["particle_pos"].dtype == np.float32
            assert g["particle_pos"].shape[0] % 4 == 0

    def test_rect_fixture_loads_and_steps(self, rect_reference_file,
                                          tmp_path):
        assert detect_mesh_caps(rect_reference_file) is None
        loader = TaskLoader(rect_reference_file)
        t = loader.get_next_task()
        assert t.task_difficulty == "hard"
        assert t.particle_pos.dtype == np.float32
        assert (t.cloth_size > 0).all()
        _run_one_step(rect_reference_file, tmp_path)

    def test_mesh_fixture_loads_and_steps(self, mesh_reference_file,
                                          tmp_path):
        loader = TaskLoader(mesh_reference_file)
        t = loader.get_next_task()
        assert t.mesh_verts.size > 0
        assert (t.cloth_size == [-1, -1]).all()
        _run_one_step(mesh_reference_file, tmp_path, mesh_caps=MESH_CAPS)
