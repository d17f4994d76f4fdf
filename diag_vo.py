"""Diagnostic: per-frame tracker state on the bench-scale 720p ride.

Renders the same video bench_vo uses, then walks the segment loop manually
printing per-frame state / inlier counts / map stats so reference-scale
failures are visible frame by frame. Not part of the framework API.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.synthetic import render_parallax_video

from pilotguru_tpu.vo.camera import CameraSettings
from pilotguru_tpu.vo.pipeline import (
    prefetch_features,
    tracker_from_settings,
    trajectory_from_tracker,
    video_frames,
)
from pilotguru_tpu.vo.flatten import flatten_trajectory
from pilotguru_tpu.vo.tracking import LOST


def main():
    frames_n = int(os.environ.get("DIAG_FRAMES", "150"))
    width = int(os.environ.get("DIAG_W", "1280"))
    height = int(os.environ.get("DIAG_H", "720"))
    feat = int(os.environ.get("DIAG_FEAT", "2000"))
    levels = int(os.environ.get("DIAG_LEVELS", "8"))
    tmp = tempfile.mkdtemp(prefix="pgtpu_diag_")
    video = os.path.join(tmp, "ride.mp4")
    fx, fy, cx, cy, true_rates = render_parallax_video(
        video, width=width, height=height, frames=frames_n, num_points=2400,
        fx=700.0 * (width / 1280.0), period_frames=60.0,
    )
    settings = CameraSettings(
        fx=fx, fy=fy, cx=cx, cy=cy, orb_features=feat, orb_levels=levels
    )

    probe = tracker_from_settings(settings)
    frames = prefetch_features(
        video_frames(video), probe.camera, probe.config, 8
    )

    segment = 0
    exhausted = False
    while not exhausted:
        tracker = tracker_from_settings(settings)
        fed = 0
        first_fid = None
        while True:
            frame = next(frames, None)
            if frame is None:
                exhausted = True
                break
            fed += 1
            if first_fid is None:
                first_fid = frame.frame_id
            kp_norm, desc, valid, level, angle = frame.features
            state = tracker.process_features(
                kp_norm, desc, valid, frame.frame_id, frame.time_usec,
                kp_level=level, kp_angle=angle,
            )
            nvalid = int(np.asarray(valid).sum())
            mapn = int(tracker.point_valid.sum())
            last = tracker.trajectory[-1] if tracker.trajectory else None
            ninl = tracker.keyframes[-1].num_inliers if tracker.keyframes else 0
            print(
                f"f{frame.frame_id:03d} st={state:12s} kp={nvalid:4d} "
                f"map={mapn:4d} kfs={len(tracker.keyframes):2d} "
                f"lastkf_inl={ninl:4d}",
                flush=True,
            )
            if state == LOST:
                break
        tracker.finalize()
        print(f"SEGMENT {segment}: fed={fed} stats={tracker.stats}")
        traj = trajectory_from_tracker(tracker)
        if traj is not None:
            res = flatten_trajectory(traj)
            t = traj.translations
            # PCA eigenvalues of the trajectory point cloud.
            c = t - t.mean(0)
            ev = np.linalg.eigvalsh(c.T @ c / len(c))
            print(
                f"  traj frames={len(traj)} eigvals={ev} "
                f"flat={'ACCEPT' if res is not None else 'REJECT'}"
            )
            if res is not None and true_rates is not None:
                _, _, angles = res
                # flatten_trajectory returns PER-POINT turn angles (the JSON
                # writer divides by dt to get angular_velocity); correlate
                # them directly against the true per-frame yaw rate.
                fid = traj.frame_id.astype(int)
                tr = np.asarray(true_rates)[fid]
                if len(angles) > 10:
                    corr = np.corrcoef(angles[3:], tr[3:])[0, 1]
                    print(f"  turn-rate corr vs truth: {corr:.3f}")
        segment += 1
    print("done")


if __name__ == "__main__":
    main()
