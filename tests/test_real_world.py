"""real_world stack tests: everything hardware-independent — imports,
URScript synthesis, RTC packet parsing, vision utilities, calibration math,
and RealWorldEnv's action-selection safety logic with mocked cameras."""

import numpy as np
import pytest


class TestImports:
    def test_package_imports_without_hardware(self):
        import flingbot_tpu.real_world as rw

        assert rw.UR5 and rw.UR5Pair and rw.WSG50 and rw.RG2
        assert rw.KinectClient and rw.RealSense and rw.RealWorldEnv


class TestUR5Protocol:
    def test_urscript_synthesis(self):
        from flingbot_tpu.real_world.ur5 import UR5

        sent = []
        ur5 = UR5("0.0.0.0")
        ur5.send_program = lambda prog: sent.append(prog)
        ur5.movej([0, -1.57, 1.57, 0, 0, 0], blocking=False)
        assert sent[-1].startswith("movej([0.000000, -1.570000")
        ur5.movel([0.1, 0.2, 0.3, 2.22, -2.22, 0], blocking=False)
        assert sent[-1].startswith("movel(p[0.100000")
        ur5.movel_waypoints(
            [[0, 0, 0.3, 2.2, -2.2, 0], [0, 0.2, 0.3, 2.2, -2.2, 0]],
            blocking=False)
        assert "def wp():" in sent[-1] and "r=0.01" in sent[-1]
        # last waypoint has no blend
        assert sent[-1].strip().splitlines()[-2].endswith("r=0.0)")

    def test_rtc_packet_parse(self):
        import struct

        from flingbot_tpu.real_world.ur5 import (
            RTC_PACKET_SIZE, UR5State, _JOINT_OFFSET, _TCP_OFFSET)

        packet = bytearray(RTC_PACKET_SIZE)
        joints = [0.1, -1.2, 1.3, -0.4, 1.5, -0.6]
        pose = [0.25, -0.1, 0.3, 2.2, -2.2, 0.0]
        packet[_JOINT_OFFSET:_JOINT_OFFSET + 48] = struct.pack(">6d", *joints)
        packet[_TCP_OFFSET:_TCP_OFFSET + 48] = struct.pack(">6d", *pose)
        st = UR5State("0.0.0.0")
        st._parse(bytes(packet))
        np.testing.assert_allclose(st.joints, joints)
        np.testing.assert_allclose(st.tcp_pose, pose)


class TestVision:
    def test_stretch_detector(self):
        from flingbot_tpu.real_world.stretch import is_stretched

        H, W = 120, 160
        taut = np.full((H, W), 2.0, np.float32)
        taut[40:80, 30:130] = 0.8  # straight level top edge
        assert is_stretched(taut)

        saggy = np.full((H, W), 2.0, np.float32)
        cols = np.arange(30, 130)
        tops = (40 + 25 * np.sin((cols - 30) / 99 * np.pi)).astype(int)
        for c, t in zip(cols, tops):
            saggy[t:80, c] = 0.8
        assert not is_stretched(saggy)

    def test_cloth_mask_and_iou(self):
        from flingbot_tpu.real_world.utils import cloth_mask_hsv, iou

        rgb = np.zeros((64, 64, 3), np.uint8)  # dark background
        rgb[20:40, 20:40] = (200, 50, 50)  # bright cloth
        mask = cloth_mask_hsv(rgb)
        assert mask[30, 30] == 1 and mask[5, 5] == 0
        assert iou(mask, mask) == 1.0


class TestCalibration:
    def test_rigid_transform_recovery(self):
        from calibrate_camera import rigid_transform

        rng = np.random.default_rng(0)
        R_true = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(R_true) < 0:
            R_true[:, 0] *= -1
        t_true = np.array([0.3, -0.2, 0.5])
        cam = rng.uniform(-1, 1, (20, 3))
        world = (R_true @ cam.T).T + t_true
        T = rigid_transform(cam, world)
        np.testing.assert_allclose(T[:3, :3], R_true, atol=1e-8)
        np.testing.assert_allclose(T[:3, 3], t_true, atol=1e-8)

    def test_depth_scale_refinement(self):
        from calibrate_camera import refine_depth_scale

        rng = np.random.default_rng(1)
        cam = rng.uniform(0.2, 1.0, (15, 3))
        cam_scaled_wrong = cam * np.array([1.0, 1.0, 1.0 / 1.07])
        scale = refine_depth_scale(cam_scaled_wrong, cam)
        assert abs(scale - 1.07) < 1e-2


class _FakeCam:
    def __init__(self, rgb, depth):
        self._rgb, self._depth = rgb, depth

    def get_rgbd(self, repeats=1):
        return self._rgb, self._depth


class TestRealWorldEnvLogic:
    def make_env(self):
        from flingbot_tpu.real_world.real_world_env import RealWorldEnv

        S = 704  # matches WS_PC crop aspect
        rgb = np.zeros((1024, 1600, 3), np.uint8)
        rgb[400:600, 700:900] = (180, 60, 60)  # cloth blob in the workspace
        depth = np.full((1024, 1600), 1.5, np.float32)
        intr = np.array([[600.0, 0, 128], [0, 600.0, 128], [0, 0, 1]])
        extr = np.eye(4)
        extr[2, 3] = 0.0
        env = RealWorldEnv(
            obs_dim=64, num_rotations=4, scale_factors=[1.0, 1.5],
            render_dim=256,
            top_camera=_FakeCam(rgb, depth),
            front_camera=_FakeCam(rgb, depth),
            cam_intrinsics=intr, cam_extrinsics=extr,
        )
        return env

    def test_obs_pipeline(self):
        env = self.make_env()
        obs = env.reset()
        assert obs.shape == (8, 4, 64, 64)
        assert env.cloth_mask.any()
        # background depth replaced with the sim floor convention
        assert float(env.pretransform_depth[0, 0]) == 2.0

    def test_action_selection_safety(self):
        env = self.make_env()
        env.reset()
        vm = np.random.default_rng(0).uniform(size=(1, 8, 64, 64))
        action = env._select_action(vm)
        if action is not None:
            # grasp width within the rig's safety bounds
            from flingbot_tpu.real_world import setup as rw

            assert rw.MIN_GRASP_WIDTH <= action["width"] \
                <= rw.MAX_GRASP_WIDTH
