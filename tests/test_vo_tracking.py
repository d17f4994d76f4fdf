"""Tracker integration tests on synthetic feature streams.

Rendering-free harness: a fixed 3D landmark cloud with stable random
descriptors; each frame's "extractor output" is the projection of the
visible landmarks through the ground-truth camera plus descriptor bit noise
and decoy features. This exercises initialization, motion-model tracking,
keyframe creation, triangulation and local BA end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pilotguru_tpu.vo.flatten import flatten_trajectory
from pilotguru_tpu.vo.pose import rotvec_to_matrix
from pilotguru_tpu.vo.tracking import (
    OK,
    CameraModel,
    MonocularTracker,
    TrackerConfig,
)

# Heavy e2e tier: excluded from the quick loop via `pytest -m "not slow"`.
pytestmark = pytest.mark.slow


class SyntheticScene:
    def __init__(self, seed=0, num_points=600, budget=256):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.budget = budget
        # Landmarks spread along the road ahead.
        self.points = np.stack(
            [
                rng.uniform(-12, 12, num_points),
                rng.uniform(-2.5, 2.5, num_points),
                rng.uniform(2, 60, num_points),
            ],
            axis=1,
        )
        self.descs = rng.integers(0, 2, size=(num_points, 256)).astype(np.uint8)

    def camera_pose(self, t):
        """Ground truth world->camera pose at time t: forward motion along a
        gently curving road (yaw about the y axis, motion along +z)."""
        yaw = 0.15 * np.sin(2 * np.pi * t / 8.0)
        c, s = np.cos(yaw), np.sin(yaw)
        r_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])  # camera->world
        center = np.array([2.0 * np.sin(t / 3.0), 0.0, 1.5 * t])
        r_cw = r_wc.T
        t_cw = -r_cw @ center
        return r_cw, t_cw, yaw

    def frame_features(self, t, noise_bits=4, decoys=24):
        r_cw, t_cw, _ = self.camera_pose(t)
        cam = self.points @ r_cw.T + t_cw
        vis = cam[:, 2] > 0.5
        uv = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-9)
        vis &= (np.abs(uv[:, 0]) < 0.9) & (np.abs(uv[:, 1]) < 0.6)
        idx = np.nonzero(vis)[0]
        self.rng.shuffle(idx)
        idx = idx[: self.budget - decoys]

        kp = np.zeros((self.budget, 2))
        desc = np.zeros((self.budget, 256), np.uint8)
        valid = np.zeros(self.budget, bool)
        kp[: len(idx)] = uv[idx] + self.rng.normal(scale=5e-4, size=(len(idx), 2))
        d = self.descs[idx].copy()
        flips = self.rng.integers(0, 256, size=(len(idx), noise_bits))
        for i in range(len(idx)):
            d[i, flips[i]] ^= 1
        desc[: len(idx)] = d
        valid[: len(idx)] = True
        # Decoy features: random positions + random descriptors.
        kp[len(idx) : len(idx) + decoys] = self.rng.uniform(
            -0.8, 0.8, size=(decoys, 2)
        )
        desc[len(idx) : len(idx) + decoys] = self.rng.integers(
            0, 2, size=(decoys, 256)
        )
        valid[len(idx) : len(idx) + decoys] = True
        return kp, desc, valid


@pytest.fixture(scope="module")
def tracked():
    scene = SyntheticScene()
    camera = CameraModel(fx=1.0, fy=1.0, cx=0.0, cy=0.0)
    config = TrackerConfig(
        total_budget=256,
        min_init_matches=40,
        min_init_inliers=30,
        min_track_inliers=15,
        match_search_radius=0.1,
    )
    tracker = MonocularTracker(camera, config, feature_fn=lambda t: scene.frame_features(t))
    times = np.arange(0, 12.0, 0.25)
    states = []
    for i, t in enumerate(times):
        states.append(tracker.process_frame(t, frame_id=i, time_usec=int(t * 1e6)))
    return scene, tracker, times, states


class TestTracking:
    def test_initializes_and_stays_ok(self, tracked):
        _, tracker, times, states = tracked
        assert states[-1] == OK
        assert len(tracker.trajectory) >= len(times) - 3

    def test_rotations_match_ground_truth(self, tracked):
        scene, tracker, _, _ = tracked
        # World frame = first camera frame; ground-truth first camera has
        # yaw(0) = 0 so frames coincide up to the global gauge.
        max_err = 0.0
        for fp in tracker.trajectory[2:]:
            r_cw_true, _, _ = scene.camera_pose(fp.time_usec * 1e-6)
            r_cw_est = np.asarray(rotvec_to_matrix(jnp.asarray(fp.pose6[:3])))
            err = np.arccos(
                np.clip((np.trace(r_cw_est @ r_cw_true.T) - 1) / 2, -1, 1)
            )
            max_err = max(max_err, err)
        assert max_err < 0.02, f"max rotation error {max_err} rad"

    def test_translation_direction_up_to_scale(self, tracked):
        scene, tracker, _, _ = tracked
        centers_est = np.stack([fp.camera_center() for fp in tracker.trajectory])
        centers_true = np.stack(
            [
                -scene.camera_pose(fp.time_usec * 1e-6)[0].T
                @ scene.camera_pose(fp.time_usec * 1e-6)[1]
                for fp in tracker.trajectory
            ]
        )
        # Solve for the single monocular scale; shapes must then agree.
        scale = np.sum(centers_est * centers_true) / np.sum(centers_est**2)
        err = np.linalg.norm(centers_est * scale - centers_true, axis=1)
        travel = np.linalg.norm(centers_true[-1])
        assert err.max() < 0.03 * travel, (err.max(), travel)

    def test_map_grows_beyond_initialization(self, tracked):
        _, tracker, _, _ = tracked
        assert tracker.point_valid.sum() > 100
        assert len(tracker.keyframes) >= 3

    def test_flatten_produces_valid_plane_and_turns(self, tracked):
        scene, tracker, _, _ = tracked
        from pilotguru_tpu.formats.trajectory import Trajectory

        n = len(tracker.trajectory)
        traj = Trajectory(
            time_usec=np.asarray([fp.time_usec for fp in tracker.trajectory]),
            frame_id=np.asarray([fp.frame_id for fp in tracker.trajectory]),
            is_lost=np.zeros(n, bool),
            translations=np.stack(
                [fp.camera_center() for fp in tracker.trajectory]
            ),
            rotations=np.stack(
                [fp.camera_to_world_quat() for fp in tracker.trajectory]
            ),
        )
        result = flatten_trajectory(traj)
        assert result is not None
        plane, directions, angles = result
        # Turn angles integrate to roughly the ground-truth yaw span.
        t_last = traj.time_usec[-1] * 1e-6
        t_first = traj.time_usec[0] * 1e-6
        want = 0.15 * np.sin(2 * np.pi * t_last / 8.0) - 0.15 * np.sin(
            2 * np.pi * t_first / 8.0
        )
        got = np.sum(angles)
        assert abs(abs(got) - abs(want)) < 0.05, (got, want)


class TestLostBehavior:
    def test_feature_dropout_causes_lost(self):
        scene = SyntheticScene(seed=1)
        camera = CameraModel(1.0, 1.0, 0.0, 0.0)
        config = TrackerConfig(
            total_budget=256, min_init_matches=40, min_init_inliers=30,
            min_track_inliers=15, match_search_radius=0.1,
        )

        def features(t):
            kp, desc, valid = scene.frame_features(t)
            if t > 4.0:  # camera "covered": only decoys remain
                valid[:] = False
                kp = scene.rng.uniform(-0.8, 0.8, size=kp.shape)
                desc = scene.rng.integers(0, 2, size=desc.shape).astype(np.uint8)
                valid[:64] = True
            return kp, desc, valid

        tracker = MonocularTracker(camera, config, feature_fn=features)
        states = []
        for i, t in enumerate(np.arange(0, 8.0, 0.25)):
            states.append(tracker.process_frame(t, i, int(t * 1e6)))
            if states[-1] == "LOST":
                break
        assert "LOST" in states
        assert tracker.trajectory[-1].is_lost
