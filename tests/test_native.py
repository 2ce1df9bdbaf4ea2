"""Native (C++) host runtime vs the pure-Python implementations."""

import numpy as np
import pytest

from flingbot_tpu import native
from flingbot_tpu.engine.topology import load_cloth as py_load_cloth

pytestmark = pytest.mark.skipif(
    not native.available, reason="fbnative not built")


def write_quad_obj(path, nx=5, ny=4):
    """A simple quad-grid OBJ cloth."""
    with open(path, "w") as f:
        for y in range(ny):
            for x in range(nx):
                f.write(f"v {x * 0.1} 0.0 {y * 0.1}\n")
        for y in range(ny - 1):
            for x in range(nx - 1):
                a = y * nx + x + 1
                b = y * nx + x + 2
                c = (y + 1) * nx + x + 2
                d = (y + 1) * nx + x + 1
                f.write(f"f {a} {b} {c} {d}\n")
    return str(path)


class TestNativeLoadCloth:
    def test_matches_python_loader(self, tmp_path):
        path = write_quad_obj(tmp_path / "cloth.obj")
        nv, nt, ns, nb, nh = native.load_cloth(path)
        pv, pt, ps, pb, ph = py_load_cloth(path)
        np.testing.assert_allclose(nv, pv)
        assert set(map(tuple, nt.tolist())) == set(map(tuple, pt.tolist()))
        for a, b in ((ns, ps), (nb, pb), (nh, ph)):
            assert set(map(tuple, a.tolist())) == set(map(tuple, b.tolist()))

    def test_edge_counts(self, tmp_path):
        nx, ny = 6, 5
        path = write_quad_obj(tmp_path / "cloth.obj", nx, ny)
        _, _, stretch, bend, shear = native.load_cloth(path)
        # quad grid: stretch = horizontal + vertical 1-neighbors
        assert len(stretch) == (nx - 1) * ny + nx * (ny - 1)
        # shear = 2 diagonals per quad
        assert len(shear) == 2 * (nx - 1) * (ny - 1)
        assert len(bend) > 0


class TestNativeCoverage:
    def test_matches_python_oracle(self):
        from tests.test_env_basics import reference_covered_area

        rng = np.random.default_rng(5)
        pos = rng.uniform(-0.3, 0.3, (800, 3)).astype(np.float32)
        pos4 = np.concatenate([pos, np.ones((800, 1), np.float32)], axis=1)
        ref = reference_covered_area(pos4.reshape(-1))
        got = native.covered_area(pos)
        # oracles differ in rounding mode (np.round = half-to-even vs
        # lround) and in the reference's vectorized_range sampling quirks;
        # the metric is a reward signal, so ~1% agreement is the contract
        assert abs(got - ref) / ref < 0.02
