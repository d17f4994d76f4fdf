"""Tracker map/session checkpointing.

The reference's ORB-SLAM2 fork adds a full protobuf map-serialization
subsystem (System::Serialize + SerializedSystem/Map/KeyFrame/... protos;
see SURVEY.md section 5, checkpoint/resume). Here the tracker state is a
handful of dense arrays + keyframe records, so a single compressed npz
captures everything needed to resume tracking or to relocalize against a
previously-built map.
"""

from __future__ import annotations

import numpy as np

from pilotguru_tpu.vo.tracking import Keyframe, MonocularTracker

FORMAT_VERSION = 1


def save_tracker_map(tracker: MonocularTracker, path: str) -> None:
    """Serialize map points, keyframes and tracker motion state."""
    data = {
        "format_version": np.asarray(FORMAT_VERSION),
        "state": np.asarray(tracker.state),
        "points": tracker.points,
        "point_desc": np.packbits(tracker.point_desc, axis=1),
        "point_valid": tracker.point_valid,
        "pose": tracker._pose,
        "motion": tracker._motion,
        "num_keyframes": np.asarray(len(tracker.keyframes)),
        "frame_times": np.asarray(
            [fp.time_usec for fp in tracker.trajectory], np.int64
        ),
        "frame_ids": np.asarray(
            [fp.frame_id for fp in tracker.trajectory], np.int64
        ),
        "frame_poses": (
            np.stack([fp.pose6 for fp in tracker.trajectory])
            if tracker.trajectory
            else np.zeros((0, 6))
        ),
        "frame_lost": np.asarray(
            [fp.is_lost for fp in tracker.trajectory], bool
        ),
    }
    for i, kf in enumerate(tracker.keyframes):
        data[f"kf{i}_pose"] = kf.pose6
        data[f"kf{i}_kp_norm"] = kf.kp_norm
        data[f"kf{i}_desc"] = np.packbits(kf.descriptors, axis=1)
        data[f"kf{i}_valid"] = kf.kp_valid
        data[f"kf{i}_map_point"] = kf.map_point
        data[f"kf{i}_inliers"] = np.asarray(kf.num_inliers)
    np.savez_compressed(path, **data)


def load_tracker_map(path: str, tracker: MonocularTracker) -> MonocularTracker:
    """Restore a saved map into a freshly-constructed tracker (camera and
    config come from the tracker, mirroring the reference's
    deserializing-System constructor reusing a loaded vocabulary)."""
    loaded = np.load(path, allow_pickle=False)
    if int(loaded["format_version"]) != FORMAT_VERSION:
        raise ValueError(
            f"unsupported tracker map format {int(loaded['format_version'])}"
        )
    points = loaded["points"]
    if points.shape[0] != tracker.points.shape[0]:
        raise ValueError(
            "tracker max_map_points does not match the saved map "
            f"({tracker.points.shape[0]} vs {points.shape[0]})"
        )
    tracker.points = points.copy()
    tracker.point_desc = np.unpackbits(loaded["point_desc"], axis=1)[:, :256]
    tracker.point_valid = loaded["point_valid"].copy()
    tracker._pose = loaded["pose"].copy()
    tracker._motion = loaded["motion"].copy()
    tracker.state = str(loaded["state"])

    from pilotguru_tpu.vo.tracking import FramePose

    tracker.trajectory = [
        FramePose(int(fid), int(ft), pose.copy(), bool(lost))
        for fid, ft, pose, lost in zip(
            loaded["frame_ids"],
            loaded["frame_times"],
            loaded["frame_poses"],
            loaded["frame_lost"],
        )
    ]
    tracker.keyframes = []
    for i in range(int(loaded["num_keyframes"])):
        tracker.keyframes.append(
            Keyframe(
                pose6=loaded[f"kf{i}_pose"].copy(),
                kp_norm=loaded[f"kf{i}_kp_norm"].copy(),
                descriptors=np.unpackbits(loaded[f"kf{i}_desc"], axis=1)[
                    :, :256
                ],
                kp_valid=loaded[f"kf{i}_valid"].copy(),
                map_point=loaded[f"kf{i}_map_point"].copy(),
                num_inliers=int(loaded[f"kf{i}_inliers"]),
            )
        )
    return tracker
