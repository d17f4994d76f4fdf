"""LocalMapping-parity tests: map-point culling, duplicate fusion, keyframe
culling, and slot recycling under arena pressure.

Reference semantics under test: LocalMapping::MapPointCulling
(/root/reference/thirdparty/orb-slam2/src/LocalMapping.cc:170-206),
SearchInNeighbors (:454-525), KeyFrameCulling (:631-695). Uses the same
rendering-free synthetic-feature harness as test_vo_tracking.
"""

import numpy as np
import pytest

from pilotguru_tpu.vo.tracking import (
    LOST,
    OK,
    CameraModel,
    MonocularTracker,
    TrackerConfig,
)
from test_vo_tracking import SyntheticScene

pytestmark = pytest.mark.slow


def run_tracker(config, scene, duration=12.0, step=0.25, feature_fn=None):
    camera = CameraModel(fx=1.0, fy=1.0, cx=0.0, cy=0.0)
    tracker = MonocularTracker(
        camera, config, feature_fn=feature_fn or (lambda t: scene.frame_features(t))
    )
    states = []
    for i, t in enumerate(np.arange(0, duration, step)):
        states.append(tracker.process_frame(t, frame_id=i, time_usec=int(t * 1e6)))
    return tracker, states


BASE = dict(
    total_budget=256,
    min_init_matches=40,
    min_init_inliers=30,
    min_track_inliers=15,
    match_search_radius=0.1,
    enable_loop_closing=False,
)


class TestMapPointCulling:
    def test_unfound_points_get_culled(self):
        scene = SyntheticScene()
        tracker, states = run_tracker(TrackerConfig(**BASE), scene)
        assert states[-1] == OK
        assert tracker.stats["points_culled"] > 0
        # Every surviving established point must satisfy the found-ratio
        # bar the culler enforces on recent ones at their last evaluation.
        valid = np.nonzero(tracker.point_valid & ~tracker.point_recent)[0]
        assert valid.size > 50

    def test_culled_slots_are_reused(self):
        scene = SyntheticScene()
        tracker, states = run_tracker(TrackerConfig(**BASE), scene)
        # Total creations exceed capacity usage: culled slots were recycled
        # by later triangulations (point_first_kf of valid points spans
        # late keyframes too).
        late = tracker.point_first_kf[tracker.point_valid] >= 3
        assert late.any()

    def test_no_dangling_keyframe_references(self):
        scene = SyntheticScene()
        tracker, _ = run_tracker(TrackerConfig(**BASE), scene)
        for kf in tracker.keyframes:
            refs = kf.map_point[kf.map_point >= 0]
            assert tracker.point_valid[refs].all(), "reference to culled point"


class TestArenaPressure:
    def test_saturated_arena_recycles_instead_of_dying(self):
        # Round-1 behavior: when the fixed arena fills, new points were
        # silently dropped until tracking degraded. Now the worst off-window
        # points must be recycled and tracking must survive the full ride
        # (VERDICT round-1, item 3). max_map_points=300 saturates within a
        # few keyframes on the standard scene.
        scene = SyntheticScene()
        config = TrackerConfig(max_map_points=300, **BASE)
        tracker, states = run_tracker(config, scene, duration=16.0)
        assert states[-1] == OK, f"tracking died: {states[-5:]}"
        assert tracker.stats["points_recycled"] > 0
        # Nothing silently dropped: every shortfall is accounted.
        assert tracker.stats["points_dropped"] == 0
        # Point count stays at a healthy level, not pinned at saturation
        # with stale points.
        assert 100 < tracker.point_valid.sum() <= 300


class TestKeyframeCulling:
    def test_redundant_keyframes_culled_when_camera_lingers(self):
        # A camera that hovers (tiny oscillation) produces keyframes that
        # all observe the same points -> the 90% redundancy rule fires.
        scene = SyntheticScene()

        def features(t):
            # Slow crawl: 10x slower than the base scene so consecutive
            # keyframes share nearly all observations.
            return scene.frame_features(t * 0.1)

        config = TrackerConfig(keyframe_max_gap=3, **BASE)
        tracker, states = run_tracker(
            config, scene, duration=20.0, feature_fn=features
        )
        assert LOST not in states
        assert tracker.stats["keyframes_culled"] > 0

    def test_trajectory_survives_keyframe_culling(self):
        scene = SyntheticScene()

        def features(t):
            return scene.frame_features(t * 0.1)

        config = TrackerConfig(keyframe_max_gap=3, **BASE)
        tracker, _ = run_tracker(config, scene, duration=20.0, feature_fn=features)
        assert tracker.stats["keyframes_culled"] > 0
        final = tracker.final_trajectory()
        assert len(final) == len(tracker.trajectory)
        live_ids = {kf.kf_id for kf in tracker.keyframes}
        for fp in tracker.trajectory:
            assert fp.ref_kf_id in live_ids or fp.ref_kf_id == -1, (
                "frame anchored to a culled keyframe was not re-anchored"
            )
        # Reconstructed poses stay finite and close to the at-track poses
        # (corrections are small refinements on this easy scene).
        for fp_final, fp_raw in zip(final, tracker.trajectory):
            assert np.all(np.isfinite(fp_final.pose6))
            assert np.linalg.norm(fp_final.pose6 - fp_raw.pose6) < 0.5


class TestFusion:
    def test_duplicate_points_get_fused(self):
        # Force duplicates: a scene that doubles back over the same stretch
        # within the local keyframe window (fusion candidates are local-only,
        # like SearchInNeighbors' covisible neighbors), so re-triangulated
        # landmarks meet their originals.
        scene = SyntheticScene()

        def features(t):
            # Forward then backward, period 4 s = ~4 keyframes at gap 4.
            tt = 2.0 - abs(2.0 - (t % 4.0))
            return scene.frame_features(tt + 0.025 * t)

        config = TrackerConfig(keyframe_max_gap=4, **BASE)
        tracker, states = run_tracker(
            config, scene, duration=14.0, feature_fn=features
        )
        assert LOST not in states
        assert tracker.stats["points_fused"] > 0

    def test_fusion_keeps_references_consistent(self):
        scene = SyntheticScene()

        def features(t):
            tt = 2.0 - abs(2.0 - (t % 4.0))
            return scene.frame_features(tt + 0.025 * t)

        config = TrackerConfig(keyframe_max_gap=4, **BASE)
        tracker, _ = run_tracker(config, scene, duration=14.0, feature_fn=features)
        for kf in tracker.keyframes:
            refs = kf.map_point[kf.map_point >= 0]
            assert tracker.point_valid[refs].all()
