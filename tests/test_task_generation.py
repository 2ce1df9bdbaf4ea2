"""Batched task generation: chunked (bounded device calls) vs the round-2
single-program crumple must produce the same tasks, and generation must
stop exactly at num_tasks including across resumes."""

import h5py
import numpy as np
import pytest

from flingbot_tpu.env.tasks import generate_tasks_batch


def _gen(path, n, difficulty, chunk_steps, batch=2):
    # small schedule (sweep, hold, settle, tosses) keeps CPU runtime sane
    # while still crossing several chunk boundaries
    return generate_tasks_batch(
        str(path), n, batch=batch, seed=11, min_cloth_size=16,
        max_cloth_size=24, strict_min_edge_length=16,
        task_difficulty=difficulty, max_grid_dim=24, chunk_steps=chunk_steps,
        schedule=(50, 30, 60, 3), log=False)


class TestChunkedGeneration:
    @pytest.mark.parametrize("difficulty", ["hard", "easy"])
    def test_chunked_matches_single_program(self, difficulty, tmp_path):
        a = tmp_path / f"{difficulty}_chunked.hdf5"
        b = tmp_path / f"{difficulty}_fused.hdf5"
        _gen(a, 2, difficulty, chunk_steps=37)
        _gen(b, 2, difficulty, chunk_steps=0)
        with h5py.File(a, "r") as fa, h5py.File(b, "r") as fb:
            assert sorted(fa.keys()) == sorted(fb.keys())
            for k in fa:
                pa = np.asarray(fa[k]["particle_pos"])
                pb = np.asarray(fb[k]["particle_pos"])
                np.testing.assert_allclose(pa, pb, atol=1e-4)
                assert (fa[k].attrs["initial_coverage"]
                        == pytest.approx(fb[k].attrs["initial_coverage"],
                                         abs=1e-4))

    def test_stops_exactly_at_num_tasks(self, tmp_path):
        path = tmp_path / "exact.hdf5"
        _gen(path, 3, "easy", chunk_steps=64, batch=2)
        with h5py.File(path, "r") as f:
            assert len(f) == 3
        # resume must top up to the new target, not append blindly
        _gen(path, 5, "easy", chunk_steps=64, batch=2)
        with h5py.File(path, "r") as f:
            assert len(f) == 5
