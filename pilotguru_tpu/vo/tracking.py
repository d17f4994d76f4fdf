"""Monocular visual-odometry tracker: host state machine + device compute.

Replaces the reference's ORB_SLAM2 Tracking/LocalMapping pipeline
(thirdparty/orb-slam2/src/Tracking.cc:272-498, LocalMapping.cc) for the
odometry use-case that optical_trajectories consumes: per-frame camera poses
until tracking is LOST (loop closing is intentionally omitted — the outputs
are used as *local* angular velocities, where drift is immaterial; see
SURVEY.md section 7 step 5).

TPU-first structure: all per-frame numerics (feature extraction, dense
Hamming matching, RANSAC initialization, robust pose refinement, local BA)
are fixed-shape jitted device programs; the host keeps only the map
bookkeeping (fixed-capacity arrays) and the keyframe policy, mirroring how
the reference splits Tracking math from map maintenance threads.

States mirror the reference enum: NOT_INITIALIZED -> OK -> LOST
(Tracking.h eTrackingState).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from pilotguru_tpu.vo import matching
from pilotguru_tpu.vo.ba import BAProblem, bundle_adjust
from pilotguru_tpu.vo.features import extract_orb_features
from pilotguru_tpu.vo.pose import (
    matrix_to_quat,
    matrix_to_rotvec,
    optimize_pose,
    project,
    rotvec_to_matrix,
    transform,
)
from pilotguru_tpu.vo.relocalize import relocalize
from pilotguru_tpu.vo.twoview import triangulate, two_view_reconstruction

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"

# Jitted device programs (shape-keyed compile cache; the tracker feeds
# fixed/bucketed shapes so each compiles a handful of times per ride).
_match_descriptors = jax.jit(
    matching.match_descriptors, static_argnames=("max_distance", "ratio", "mutual")
)
_match_projected = jax.jit(
    matching.match_projected,
    static_argnames=("search_radius", "max_distance", "ratio"),
)
_two_view = jax.jit(
    two_view_reconstruction,
    static_argnames=("num_hypotheses", "inlier_threshold"),
)
_optimize_pose = jax.jit(
    optimize_pose,
    static_argnames=(
        "huber_delta", "inlier_threshold", "irls_rounds", "lm_iters",
    ),
)
_bundle_adjust = jax.jit(
    bundle_adjust,
    static_argnames=(
        "huber_delta", "inlier_threshold", "irls_rounds", "lm_iters",
    ),
)
_triangulate = jax.jit(triangulate)
_transform = jax.jit(transform)
_project = jax.jit(project)


@dataclass(frozen=True)
class CameraModel:
    fx: float
    fy: float
    cx: float
    cy: float

    def normalize(self, xy):
        return np.stack(
            [(xy[..., 0] - self.cx) / self.fx, (xy[..., 1] - self.cy) / self.fy],
            axis=-1,
        )


@dataclass(frozen=True)
class TrackerConfig:
    total_budget: int = 1000
    num_levels: int = 4
    fast_threshold: float = 20.0 / 255.0
    max_map_points: int = 4096
    local_window: int = 6  # keyframes in local BA
    min_init_matches: int = 60
    min_init_inliers: int = 40
    min_track_inliers: int = 25
    keyframe_inlier_ratio: float = 0.75
    keyframe_max_gap: int = 8
    match_search_radius: float = 0.08  # normalized-plane units
    min_parallax_cos: float = 0.9999
    ba_every_keyframe: bool = True


@dataclass
class FramePose:
    frame_id: int
    time_usec: int
    pose6: np.ndarray  # world->camera [rotvec, t]
    is_lost: bool = False

    def camera_to_world_quat(self) -> np.ndarray:
        r_wc = np.asarray(rotvec_to_matrix(jnp.asarray(self.pose6[:3]))).T
        return np.asarray(matrix_to_quat(jnp.asarray(r_wc)))

    def camera_center(self) -> np.ndarray:
        r = np.asarray(rotvec_to_matrix(jnp.asarray(self.pose6[:3])))
        return -(r.T @ self.pose6[3:])


@dataclass
class Keyframe:
    pose6: np.ndarray
    kp_norm: np.ndarray  # [K, 2] normalized coords
    descriptors: np.ndarray  # [K, 256] uint8
    kp_valid: np.ndarray  # [K] bool
    map_point: np.ndarray  # [K] int32 — map point index per keypoint or -1
    num_inliers: int = 0


class MonocularTracker:
    """Feature-based monocular odometry over a frame stream."""

    def __init__(
        self,
        camera: CameraModel,
        config: TrackerConfig = TrackerConfig(),
        feature_fn=None,
    ):
        self.camera = camera
        self.config = config
        self.state = NOT_INITIALIZED
        self._feature_fn = feature_fn or self._extract
        # Map storage (fixed capacity).
        m = config.max_map_points
        self.points = np.zeros((m, 3), np.float64)
        self.point_desc = np.zeros((m, 256), np.uint8)
        self.point_valid = np.zeros((m,), bool)
        self.keyframes: List[Keyframe] = []
        self.trajectory: List[FramePose] = []
        self._init_frame = None  # (kp_norm, desc, valid, frame_id, time)
        self._init_attempts = 0
        self._pose = np.zeros(6)
        self._motion = np.zeros(6)  # se3-ish delta applied per frame
        self._frames_since_keyframe = 0
        self._rng = jax.random.PRNGKey(0)

    # ---------------------------------------------------------------- utils
    def _extract(self, gray):
        kps = extract_orb_features(
            jnp.asarray(gray, jnp.float32),
            num_levels=self.config.num_levels,
            total_budget=self.config.total_budget,
            threshold=self.config.fast_threshold,
        )
        return (
            self.camera.normalize(np.asarray(kps.xy)),
            np.asarray(kps.descriptors),
            np.asarray(kps.valid),
        )

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _free_slots(self, count):
        free = np.nonzero(~self.point_valid)[0]
        return free[:count]

    # ------------------------------------------------------------ lifecycle
    def process_frame(self, gray, frame_id: int, time_usec: int) -> str:
        kp_norm, desc, valid = self._feature_fn(gray)
        return self.process_features(kp_norm, desc, valid, frame_id, time_usec)

    def process_features(
        self, kp_norm, desc, valid, frame_id: int, time_usec: int
    ) -> str:
        """Feed one frame's PRE-EXTRACTED features (batched-prefetch path)."""
        if self.state == NOT_INITIALIZED:
            self._try_initialize(kp_norm, desc, valid, frame_id, time_usec)
        elif self.state == OK:
            self._track(kp_norm, desc, valid, frame_id, time_usec)
        return self.state

    # ------------------------------------------------------- initialization
    def _try_initialize(self, kp_norm, desc, valid, frame_id, time_usec):
        if self._init_frame is None:
            self._init_frame = (kp_norm, desc, valid, frame_id, time_usec)
            return
        kp0, d0, v0, fid0, t0 = self._init_frame
        m = _match_descriptors(
            jnp.asarray(d0), jnp.asarray(desc),
            valid_a=jnp.asarray(v0), valid_b=jnp.asarray(valid),
            max_distance=matching.HAMMING_LOW, ratio=0.9,
        )
        idx = np.asarray(m.index)
        ok = np.asarray(m.valid)
        if ok.sum() < self.config.min_init_matches:
            self._init_attempts += 1
            if self._init_attempts > 5:
                # Reference resets the initial frame when matching keeps
                # failing (Tracking::MonocularInitialization).
                self._init_frame = (kp_norm, desc, valid, frame_id, time_usec)
                self._init_attempts = 0
            return

        p1 = np.where(ok[:, None], kp0, 0.0)
        p2 = np.where(ok[:, None], kp_norm[np.clip(idx, 0, None)], 0.0)
        res = _two_view(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(ok), self._next_key()
        )
        if int(res.score) < self.config.min_init_inliers:
            self._init_attempts += 1
            return

        inl = np.asarray(res.inliers)
        pts = np.asarray(res.points3d)
        # Monocular scale: median depth of inliers -> 1 (like ORB-SLAM2's
        # initializer normalization).
        depths = pts[inl, 2]
        scale = 1.0 / max(np.median(depths), 1e-6)
        pts = pts * scale
        t21 = np.asarray(res.translation) * scale
        r21 = np.asarray(res.rotation)

        # World frame = first camera frame. Store map points.
        n_new = int(inl.sum())
        slots = self._free_slots(n_new)
        src_rows = np.nonzero(inl)[0]
        src_rows = src_rows[: len(slots)]
        self.points[slots] = pts[src_rows]
        self.point_desc[slots] = desc[np.clip(idx[src_rows], 0, None)]
        self.point_valid[slots] = True

        pose0 = np.zeros(6)
        pose1 = np.concatenate(
            [np.asarray(matrix_to_rotvec(jnp.asarray(r21))), t21]
        )

        kf0_map = np.full(kp0.shape[0], -1, np.int32)
        kf0_map[src_rows] = slots
        kf1_map = np.full(kp_norm.shape[0], -1, np.int32)
        kf1_map[idx[src_rows]] = slots

        self.keyframes = [
            Keyframe(pose0, kp0, d0, v0, kf0_map, n_new),
            Keyframe(pose1, kp_norm, desc, valid, kf1_map, n_new),
        ]
        self.trajectory.append(FramePose(fid0, t0, pose0))
        self.trajectory.append(FramePose(frame_id, time_usec, pose1))
        self._pose = pose1
        self._motion = self._pose_delta(pose0, pose1)
        self._frames_since_keyframe = 0
        self.state = OK

    @staticmethod
    def _pose_delta(prev6, curr6):
        """delta such that curr = delta o prev (world->camera composition)."""
        r_prev = np.asarray(rotvec_to_matrix(jnp.asarray(prev6[:3])))
        r_curr = np.asarray(rotvec_to_matrix(jnp.asarray(curr6[:3])))
        r_d = r_curr @ r_prev.T
        t_d = curr6[3:] - r_d @ prev6[3:]
        return np.concatenate(
            [np.asarray(matrix_to_rotvec(jnp.asarray(r_d))), t_d]
        )

    @staticmethod
    def _compose(delta6, pose6):
        r_d = np.asarray(rotvec_to_matrix(jnp.asarray(delta6[:3])))
        r_p = np.asarray(rotvec_to_matrix(jnp.asarray(pose6[:3])))
        r = r_d @ r_p
        t = r_d @ pose6[3:] + delta6[3:]
        return np.concatenate([np.asarray(matrix_to_rotvec(jnp.asarray(r))), t])

    # --------------------------------------------------------------- track
    def _track_attempt(self, predicted, kp_norm, desc, valid):
        """Projected matching + robust pose refinement around a pose guess
        (SearchByProjection + PoseOptimization analogue). Returns
        (pose_result, match_idx, inliers)."""
        cam = np.asarray(
            _transform(jnp.asarray(predicted), jnp.asarray(self.points))
        )
        in_front = (cam[:, 2] > 0.05) & self.point_valid
        proj = np.asarray(_project(jnp.asarray(cam)))
        proj = np.where(in_front[:, None], proj, 1e3)

        m = _match_projected(
            jnp.asarray(self.point_desc), jnp.asarray(proj),
            jnp.asarray(desc), jnp.asarray(kp_norm),
            search_radius=self.config.match_search_radius,
            valid_a=jnp.asarray(in_front), valid_b=jnp.asarray(valid),
            max_distance=matching.HAMMING_HIGH,
        )
        match_idx = np.asarray(m.index)  # per map point -> kp index
        match_ok = np.asarray(m.valid)

        obs = np.where(
            match_ok[:, None], kp_norm[np.clip(match_idx, 0, None)], 0.0
        )
        res = _optimize_pose(
            jnp.asarray(predicted),
            jnp.asarray(self.points),
            jnp.asarray(obs),
            jnp.asarray(match_ok),
        )
        return res, match_idx, np.asarray(res.inliers)

    def _track(self, kp_norm, desc, valid, frame_id, time_usec):
        predicted = self._compose(self._motion, self._pose)
        res, match_idx, inliers = self._track_attempt(
            predicted, kp_norm, desc, valid
        )
        num_inliers = int(res.num_inliers)

        if num_inliers < self.config.min_track_inliers:
            # Motion-model tracking failed: attempt relocalization from
            # scratch against the whole map before falling to LOST
            # (Tracking.cc: Relocalization() precedes the LOST state). A
            # relocalized pose only counts if GUIDED re-tracking around it
            # reaches full tracking quality — a plausible-but-wrong pose
            # must never replace the state (it would poison the motion
            # model and lose the segment within a few frames).
            reloc = relocalize(
                jnp.asarray(self.points),
                jnp.asarray(self.point_desc),
                jnp.asarray(self.point_valid),
                jnp.asarray(kp_norm),
                jnp.asarray(desc),
                jnp.asarray(valid),
                self._next_key(),
            )
            accepted = False
            if int(reloc.num_inliers) >= max(8, self.config.min_track_inliers // 2):
                res2, match_idx2, inliers2 = self._track_attempt(
                    np.asarray(reloc.pose6), kp_norm, desc, valid
                )
                if int(res2.num_inliers) >= self.config.min_track_inliers:
                    res, match_idx, inliers = res2, match_idx2, inliers2
                    num_inliers = int(res2.num_inliers)
                    self._motion = np.zeros(6)  # motion model invalidated
                    accepted = True
            if not accepted:
                self.state = LOST
                self.trajectory.append(
                    FramePose(
                        frame_id, time_usec, self._pose.copy(), is_lost=True
                    )
                )
                return

        new_pose = np.asarray(res.pose6)
        self._motion = self._pose_delta(self._pose, new_pose)
        self._pose = new_pose
        self.trajectory.append(FramePose(frame_id, time_usec, new_pose.copy()))
        self._frames_since_keyframe += 1

        ref_inliers = self.keyframes[-1].num_inliers or num_inliers
        need_keyframe = (
            num_inliers < self.config.keyframe_inlier_ratio * ref_inliers
            or self._frames_since_keyframe >= self.config.keyframe_max_gap
        )
        if need_keyframe:
            kp_map = np.full(kp_norm.shape[0], -1, np.int32)
            matched_points = np.nonzero(inliers)[0]
            kp_map[match_idx[matched_points]] = matched_points
            kf = Keyframe(
                new_pose.copy(), kp_norm, desc, valid, kp_map, num_inliers
            )
            self.keyframes.append(kf)
            self._create_new_points(kf)
            if self.config.ba_every_keyframe and len(self.keyframes) >= 3:
                self._local_bundle_adjust()
            self._frames_since_keyframe = 0

    # ----------------------------------------------------------- map growth
    def _create_new_points(self, kf: Keyframe):
        """Triangulate unmatched features against the previous keyframe
        (LocalMapping::CreateNewMapPoints analogue)."""
        prev = self.keyframes[-2]
        un_prev = prev.kp_valid & (prev.map_point < 0)
        un_curr = kf.kp_valid & (kf.map_point < 0)
        if un_prev.sum() < 8 or un_curr.sum() < 8:
            return
        m = _match_descriptors(
            jnp.asarray(prev.descriptors), jnp.asarray(kf.descriptors),
            valid_a=jnp.asarray(un_prev), valid_b=jnp.asarray(un_curr),
            max_distance=matching.HAMMING_LOW, ratio=0.85,
        )
        idx = np.asarray(m.index)
        ok = np.asarray(m.valid)
        rows = np.nonzero(ok)[0]
        if rows.size == 0:
            return

        # Relative pose prev -> curr.
        delta = self._pose_delta(prev.pose6, kf.pose6)
        r21 = np.asarray(rotvec_to_matrix(jnp.asarray(delta[:3])))
        t21 = delta[3:]
        p1 = prev.kp_norm[rows]
        p2 = kf.kp_norm[idx[rows]]
        pts_cam_prev = np.asarray(
            _triangulate(jnp.asarray(r21), jnp.asarray(t21), jnp.asarray(p1), jnp.asarray(p2))
        )
        # Filter: cheirality in both views, parallax, reprojection.
        z1 = pts_cam_prev[:, 2]
        cam2 = pts_cam_prev @ r21.T + t21
        z2 = cam2[:, 2]
        ray1 = pts_cam_prev / (np.linalg.norm(pts_cam_prev, axis=1, keepdims=True) + 1e-12)
        c2_in_prev = -r21.T @ t21
        ray2 = pts_cam_prev - c2_in_prev
        ray2 /= np.linalg.norm(ray2, axis=1, keepdims=True) + 1e-12
        parallax_cos = np.sum(ray1 * ray2, axis=1)
        reproj1 = np.linalg.norm(pts_cam_prev[:, :2] / z1[:, None] - p1, axis=1)
        reproj2 = np.linalg.norm(cam2[:, :2] / np.maximum(z2, 1e-9)[:, None] - p2, axis=1)
        good = (
            (z1 > 0.05) & (z2 > 0.05)
            & (parallax_cos < self.config.min_parallax_cos)
            & (reproj1 < 0.01) & (reproj2 < 0.01)
            & np.all(np.isfinite(pts_cam_prev), axis=1)
        )
        rows = rows[good]
        if rows.size == 0:
            return
        pts_cam_prev = pts_cam_prev[good]

        # To world frame via prev pose.
        r_prev = np.asarray(rotvec_to_matrix(jnp.asarray(prev.pose6[:3])))
        pts_world = (pts_cam_prev - prev.pose6[3:]) @ r_prev  # R^T (x - t)

        slots = self._free_slots(rows.size)
        take = len(slots)
        self.points[slots] = pts_world[:take]
        self.point_desc[slots] = kf.descriptors[idx[rows[:take]]]
        self.point_valid[slots] = True
        prev.map_point[rows[:take]] = slots
        kf.map_point[idx[rows[:take]]] = slots

    # ------------------------------------------------------------- local BA
    def _local_bundle_adjust(self):
        window = self.keyframes[-self.config.local_window :]
        fixed_offset = len(self.keyframes) - len(window)
        obs_pose, obs_point, obs_uv = [], [], []
        point_ids = {}
        for ki, kf in enumerate(window):
            kp_rows = np.nonzero(kf.map_point >= 0)[0]
            for row in kp_rows:
                pid = int(kf.map_point[row])
                if not self.point_valid[pid]:
                    continue
                local_pid = point_ids.setdefault(pid, len(point_ids))
                obs_pose.append(ki)
                obs_point.append(local_pid)
                obs_uv.append(kf.kp_norm[row])
        if len(point_ids) < 10 or len(obs_uv) < 30:
            return
        pids = np.asarray(sorted(point_ids, key=point_ids.get))

        # Pad to fixed buckets so the jitted BA compiles a handful of shapes
        # over the whole ride instead of once per keyframe: poses padded to
        # the window size, points/observations to power-of-two-ish buckets.
        def bucket(n, step):
            return -(-n // step) * step

        num_k = self.config.local_window
        poses = np.stack([kf.pose6 for kf in window])
        if poses.shape[0] < num_k:
            poses = np.concatenate(
                [poses, np.repeat(poses[-1:], num_k - poses.shape[0], axis=0)]
            )
        num_m = bucket(len(pids), 256)
        pts = np.zeros((num_m, 3))
        pts[: len(pids)] = self.points[pids]
        pts[len(pids):, 2] = 1.0  # benign padding in front of the camera
        point_valid = np.zeros(num_m, bool)
        point_valid[: len(pids)] = True
        num_o = bucket(len(obs_uv), 1024)
        o_pose = np.zeros(num_o, np.int32)
        o_point = np.zeros(num_o, np.int32)
        o_uv = np.zeros((num_o, 2))
        o_valid = np.zeros(num_o, bool)
        o_pose[: len(obs_pose)] = obs_pose
        o_point[: len(obs_point)] = obs_point
        o_uv[: len(obs_uv)] = np.stack(obs_uv)
        o_valid[: len(obs_uv)] = True

        problem = BAProblem(
            jnp.asarray(poses),
            jnp.asarray(pts),
            jnp.asarray(o_pose),
            jnp.asarray(o_point),
            jnp.asarray(o_uv),
            jnp.asarray(o_valid),
            jnp.asarray(point_valid),
        )
        result = _bundle_adjust(problem)
        new_poses = np.asarray(result.poses6)
        for ki, kf in enumerate(window):
            kf.pose6 = new_poses[ki]
        self.points[pids] = np.asarray(result.points)[: len(pids)]
        # Keep the tracker's current pose consistent with the refined last KF.
        self._pose = new_poses[len(window) - 1].copy()
        _ = fixed_offset  # window poses all free; gauge pinned inside BA
