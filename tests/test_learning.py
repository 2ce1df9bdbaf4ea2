"""Tests for transforms, value nets, policy, and replay memory."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.learning.transforms import (
    prepare_image,
    transform_pixels_to_source,
    preprocess_obs,
)
from flingbot_tpu.learning.nets import (
    SpatialValueNet,
    MaximumValuePolicy,
    value_map_inference,
)
from flingbot_tpu.learning.memory import Memory


class TestTransforms:
    def test_identity_view_is_downsample(self):
        src = np.zeros((128, 128, 1), np.float32)
        src[32:96, 32:96] = 1.0
        out = prepare_image(
            jnp.asarray(src), jnp.asarray([0.0]), jnp.asarray([1.0]),
            out_dim=64)
        img = np.asarray(out[0, 0])
        assert img.shape == (64, 64)
        # center bright, corners dark
        assert img[32, 32] > 0.9
        assert img[2, 2] < 0.1
        # the bright square occupies the same fraction of the view
        assert abs(img.mean() - src.mean()) < 0.02

    def test_scale_zooms_out(self):
        src = np.zeros((128, 128, 1), np.float32)
        src[54:74, 54:74] = 1.0
        outs = prepare_image(
            jnp.asarray(src), jnp.asarray([0.0]),
            jnp.asarray([0.5, 2.0]), out_dim=64)
        # scale 0.5 crops in -> bright square looks bigger
        frac_small = np.asarray(outs[0, 0]).mean()
        frac_big = np.asarray(outs[1, 0]).mean()
        assert frac_small > 3.5 * frac_big

    def test_rotation_moves_content(self):
        src = np.zeros((128, 128, 1), np.float32)
        src[10:30, 54:74] = 1.0  # blob at top
        out = prepare_image(
            jnp.asarray(src), jnp.asarray([90.0]), jnp.asarray([1.0]),
            out_dim=128)
        img = np.asarray(out[0, 0])
        # after 90 deg rotation the blob sits on a side, not the top
        top = img[:40, 44:84].mean()
        assert top < 0.1
        assert img.max() > 0.9

    def test_pixel_roundtrip_consistency(self):
        """Value sampled at a transformed pixel equals the source value at
        the mapped source pixel — obs warp and action decode agree."""
        rng = np.random.default_rng(3)
        src = rng.uniform(size=(200, 200, 1)).astype(np.float32)
        rot, scale = 37.0, 1.3
        out = prepare_image(
            jnp.asarray(src), jnp.asarray([rot]), jnp.asarray([scale]),
            out_dim=64)
        for py, px in [(20, 30), (40, 12), (32, 32)]:
            src_px = np.asarray(transform_pixels_to_source(
                jnp.asarray([py, px], jnp.float32), rot, scale, 200, 64))
            r, c = src_px
            if 1 <= r < 199 and 1 <= c < 199:
                got = float(out[0, 0, py, px])
                want = float(src[int(round(r)), int(round(c)), 0])
                # bilinear vs nearest: compare against local neighborhood
                nb = src[int(r) - 1:int(r) + 2, int(c) - 1:int(c) + 2, 0]
                assert nb.min() - 1e-3 <= got <= nb.max() + 1e-3

    def test_preprocess_obs(self):
        rgb = np.full((32, 32, 3), 128, np.uint8)
        d = np.full((32, 32), 2.0, np.float32)
        obs = np.asarray(preprocess_obs(jnp.asarray(rgb), jnp.asarray(d)))
        assert obs.shape == (4, 32, 32)
        assert abs(obs[0, 0, 0] - 128 / 255) < 1e-5
        assert obs[3, 0, 0] == 2.0


class TestNets:
    def test_forward_shapes_and_resolution_preserved(self):
        net = SpatialValueNet()
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 4, 64, 64))
        variables = net.init(rng, x, train=False)
        y = net.apply(variables, x, train=False)
        assert y.shape == (2, 64, 64)

    def test_rgb_only_uses_three_channels(self):
        net = SpatialValueNet(rgb_only=True)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 4, 32, 32))
        variables = net.init(rng, x, train=False)
        y1 = net.apply(variables, x, train=False)
        x2 = x.at[:, 3].set(123.0)  # depth must be ignored
        y2 = net.apply(variables, x2, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))

    def test_policy_value_maps(self):
        policy = MaximumValuePolicy(
            action_primitives=["fling"],
            num_rotations=4,
            scale_factors=[1.0, 1.5],
            obs_dim=64,
        )
        obs = jnp.zeros((8, 4, 64, 64))
        vms = policy.value_maps(obs)
        assert set(vms) == {"fling"}
        assert vms["fling"].shape == (8, 64, 64)

    def test_tta_inference_is_dihedral_equivariant(self):
        """The D4-averaged value map must be exactly equivariant: rotating
        the input rotates the output — true for ANY net, by symmetrization.
        Plain inference on a random net is NOT, which is what TTA fixes."""
        from flingbot_tpu.learning.nets import (
            value_map_inference, value_map_inference_tta)

        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=4,
            scale_factors=[1.0], obs_dim=32, tta=True)
        ns = policy.nets["fling"]
        obs = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32, 32))
        obs_r = jnp.rot90(obs, 1, axes=(-2, -1))

        tta = value_map_inference_tta(ns.net, ns.params, ns.batch_stats, obs)
        tta_r = value_map_inference_tta(
            ns.net, ns.params, ns.batch_stats, obs_r)
        np.testing.assert_allclose(
            np.asarray(jnp.rot90(tta, 1, axes=(-2, -1))), np.asarray(tta_r),
            atol=1e-5)

        plain = value_map_inference(ns.net, ns.params, ns.batch_stats, obs)
        plain_r = value_map_inference(
            ns.net, ns.params, ns.batch_stats, obs_r)
        assert not np.allclose(
            np.asarray(jnp.rot90(plain, 1, axes=(-2, -1))),
            np.asarray(plain_r), atol=1e-5)

        # the policy routes through TTA when enabled
        vm = policy.value_maps(obs)["fling"]
        np.testing.assert_allclose(np.asarray(vm), np.asarray(tta), atol=1e-6)

    def test_policy_checkpoint_roundtrip(self):
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=4,
            scale_factors=[1.0], obs_dim=32)
        sd = policy.state_dict()
        policy2 = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=4,
            scale_factors=[1.0], obs_dim=32, seed=99)
        policy2.load_state_dict(sd)
        obs = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32))
        v1 = policy.value_maps(obs)["fling"]
        v2 = policy2.value_maps(obs)["fling"]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


class TestMemory:
    def test_dump_schema(self, tmp_path):
        path = str(tmp_path / "replay.hdf5")
        for _ in range(2):  # two episodes
            mem = Memory()
            for step in range(3):
                mem.add_observation(np.zeros((4, 8, 8), np.float32))
                mem.add_action(np.zeros((8, 8), np.float32))
                mem.add_value("preaction_coverage", 0.1 + step)
                mem.add_value("postaction_coverage", 0.2 + step)
                mem.add_value("max_coverage", 1.0)
                mem.add_value("action_primitive", "fling")
                mem.add_value("task_difficulty", "hard")
                mem.add_value("init_coverage", 0.1)
                mem.add_rewards_and_termination(0.1, step == 2)
            mem.dump(path)
        with h5py.File(path, "r") as f:
            keys = sorted(f.keys())
            assert keys == [
                "000000000_step00", "000000000_step01",
                "000000000_step02_last",
                "000000001_step00", "000000001_step01",
                "000000001_step02_last",
            ]
            g = f["000000000_step01"]
            assert g.attrs["preaction_coverage"] == 1.1
            assert g.attrs["action_primitive"] == "fling"
            assert g["observations"].shape == (4, 8, 8)
            assert g["actions"].shape == (8, 8)


class TestMirrorAugment:
    def test_flip_is_consistent_and_stochastic(self, tmp_path):
        """mirror_augment x-flips obs and action TOGETHER, ~half the time."""
        from flingbot_tpu.learning.dataset import GraspDataset

        path = str(tmp_path / "replay.hdf5")
        mem = Memory()
        obs = np.zeros((4, 8, 8), np.float32)
        obs[0, 2, 1] = 1.0  # marker at column 1
        a = np.zeros((8, 8), np.float32)
        a[2, 1] = 1.0
        mem.add_observation(obs)
        mem.add_action(a)
        mem.add_value("preaction_coverage", 0.1)
        mem.add_value("postaction_coverage", 0.3)
        mem.add_value("max_coverage", 1.0)
        mem.add_value("action_primitive", "fling")
        mem.add_value("task_difficulty", "hard")
        mem.add_value("init_coverage", 0.1)
        mem.add_rewards_and_termination(0.2, True)
        mem.dump(path)

        ds = GraspDataset(hdf5_path=path, mirror_augment=True, seed=3)
        cols = set()
        for _ in range(30):
            o, m, r = ds[0]
            (row, col) = np.argwhere(m)[0]
            assert row == 2 and col in (1, 6)
            # obs marker must flip WITH the mask
            assert o[0, 2, col] == 1.0
            assert r == np.float32(0.2)
            cols.add(int(col))
        assert cols == {1, 6}  # both orientations seen

        ds_off = GraspDataset(hdf5_path=path, mirror_augment=False, seed=3)
        for _ in range(5):
            _, m, _ = ds_off[0]
            assert np.argwhere(m)[0][1] == 1

    def test_dihedral_covers_all_eight_views(self, tmp_path):
        """dihedral_augment applies one of the 8 D4 transforms, obs and
        action TOGETHER, and eventually produces all 8 marker positions."""
        from flingbot_tpu.learning.dataset import GraspDataset

        path = str(tmp_path / "replay.hdf5")
        mem = Memory()
        obs = np.zeros((4, 8, 8), np.float32)
        obs[0, 2, 1] = 1.0  # off-center, off-diagonal marker
        a = np.zeros((8, 8), np.float32)
        a[2, 1] = 1.0
        mem.add_observation(obs)
        mem.add_action(a)
        mem.add_value("preaction_coverage", 0.1)
        mem.add_value("postaction_coverage", 0.3)
        mem.add_value("max_coverage", 1.0)
        mem.add_value("action_primitive", "fling")
        mem.add_value("task_difficulty", "hard")
        mem.add_value("init_coverage", 0.1)
        mem.add_rewards_and_termination(0.2, True)
        mem.dump(path)

        ds = GraspDataset(hdf5_path=path, dihedral_augment=True, seed=5)
        seen = set()
        for _ in range(200):
            o, m, r = ds[0]
            assert m.sum() == 1
            (row, col) = np.argwhere(m)[0]
            # the obs marker must ride the SAME transform as the mask
            assert o[0, row, col] == 1.0
            assert o[0].sum() == 1.0
            assert r == np.float32(0.2)
            seen.add((int(row), int(col)))
        # (2,1) under the 8 dihedral transforms of an 8x8 grid
        expected = {(2, 1), (2, 6), (5, 1), (5, 6),
                    (1, 2), (1, 5), (6, 2), (6, 5)}
        assert seen == expected
