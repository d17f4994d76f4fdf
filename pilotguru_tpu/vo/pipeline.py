"""optical_trajectories pipeline: video -> per-segment trajectory JSONs.

Reference flow (/root/reference/src/optical_trajectories.cc:73-111 +
src/slam/track_image_sequence.cc): run monocular odometry until tracking is
LOST, post-process the segment (optional quaternion smoothing, translation
PCA with the lambda3 flatness test, planar headings, turn angles), write
trajectory-N.json, then restart a fresh tracker on the remaining video.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from pilotguru_tpu.formats.trajectory import Trajectory, write_trajectory
from pilotguru_tpu.timeseries.smoothing import smooth_quaternion_sequence
from pilotguru_tpu.vo.camera import CameraSettings
from pilotguru_tpu.vo.flatten import flatten_trajectory
from pilotguru_tpu.vo.tracking import (
    LOST,
    CameraModel,
    MonocularTracker,
    TrackerConfig,
)


@dataclass
class VideoFrame:
    gray: np.ndarray  # [H, W] float32 in [0, 1]
    frame_id: int
    time_usec: int
    # Pre-extracted (kp_norm, desc, valid) from the batched prefetcher;
    # None means the tracker extracts on its own.
    features: Optional[tuple] = None


def prefetch_features(
    frames: Iterator[VideoFrame],
    camera,
    config,
    batch_size: int = 8,
) -> Iterator[VideoFrame]:
    """Attach ORB features to frames, extracted in whole-batch device calls.

    Extraction is stateless per frame while tracking is sequential, so
    batching it amortizes dispatch latency and keeps the chip busy; one
    host transfer moves the whole batch's keypoints back. Short tail
    batches are padded by repetition (results sliced away).
    """
    import jax.numpy as jnp

    from pilotguru_tpu.vo.features import extract_orb_features_batch

    pending: list[VideoFrame] = []

    def flush():
        n = len(pending)
        grays = [f.gray for f in pending]
        while len(grays) < batch_size:  # pad tail batch, reuse compile
            grays.append(grays[-1])
        kps = extract_orb_features_batch(
            jnp.asarray(np.stack(grays), jnp.float32),
            num_levels=config.num_levels,
            scale=config.scale,
            total_budget=config.total_budget,
            threshold=config.fast_threshold,
        )
        xy = np.asarray(kps.xy)
        valid = np.asarray(kps.valid)
        level = np.asarray(kps.level)
        angle = np.asarray(kps.angle)
        for i in range(n):
            f = pending[i]
            # Keypoints/validity/levels/angles come back to host (small,
            # needed for bookkeeping); descriptors STAY on device — the
            # per-frame matching consumes them there, and the tracker pulls
            # a host copy only when a frame is promoted to keyframe.
            f.features = (
                camera.normalize(xy[i]),
                kps.descriptors[i],
                valid[i],
                level[i],
                angle[i],
            )
            yield f
        pending.clear()

    for frame in frames:
        pending.append(frame)
        if len(pending) == batch_size:
            yield from flush()
    if pending:
        yield from flush()


def video_frames(
    video_path: str,
    vertical_flip: bool = False,
    horizontal_flip: bool = False,
    scale: float = 1.0,
) -> Iterator[VideoFrame]:
    """Decode a ride video to grayscale frames with timestamps.

    Prefers the native libav reader (native/libpgvideo.so: rotation
    metadata + exact presentation timestamps, mirroring the reference's
    src/io/image_sequence_reader.cc); falls back to cv2 when the library is
    not built. Flips mirror --vertical_flip/--horizontal_flip.
    """
    from pilotguru_tpu.video import native as native_video

    if native_video.available():
        import cv2

        with native_video.NativeVideoReader(
            video_path, vertical_flip, horizontal_flip
        ) as reader:
            frame_id = 0
            for rgb, pts_usec in reader:
                gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
                if scale != 1.0:
                    gray = cv2.resize(
                        gray, None, fx=scale, fy=scale,
                        interpolation=cv2.INTER_AREA,
                    )
                yield VideoFrame(
                    gray.astype(np.float32) / 255.0, frame_id, pts_usec
                )
                frame_id += 1
        return

    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frame_id = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if scale != 1.0:
            gray = cv2.resize(
                gray, None, fx=scale, fy=scale, interpolation=cv2.INTER_AREA
            )
        if vertical_flip:
            gray = gray[::-1]
        if horizontal_flip:
            gray = gray[:, ::-1]
        msec = cap.get(cv2.CAP_PROP_POS_MSEC)
        time_usec = int(msec * 1000) if msec > 0 else int(frame_id / fps * 1e6)
        yield VideoFrame(
            gray.astype(np.float32) / 255.0, frame_id, time_usec
        )
        frame_id += 1
    cap.release()


def tracker_from_settings(
    settings: CameraSettings, image_scale: float = 1.0
) -> MonocularTracker:
    camera = CameraModel(
        fx=settings.fx * image_scale,
        fy=settings.fy * image_scale,
        cx=settings.cx * image_scale,
        cy=settings.cy * image_scale,
        # Distortion coefficients act on the normalized plane, so they are
        # invariant to image_scale (Frame.cc UndistortKeyPoints parity).
        k1=settings.k1,
        k2=settings.k2,
        p1=settings.p1,
        p2=settings.p2,
    )
    # Reference scale by default: 2000 features / 8 pyramid levels
    # (calibrate.cc:518-531); the camera YAML is the source of truth.
    config = TrackerConfig(
        total_budget=settings.orb_features,
        num_levels=settings.orb_levels,
        fast_threshold=settings.orb_ini_th_fast / 255.0,
    )
    return MonocularTracker(camera, config)


def trajectory_from_tracker(tracker: MonocularTracker) -> Optional[Trajectory]:
    # Reconstruct absolute poses from the CURRENT keyframe poses so local-BA
    # and loop-closure corrections reach every frame (System::GetTrajectory
    # semantics, System.cc:371-413).
    frames = [fp for fp in tracker.final_trajectory() if not fp.is_lost]
    if len(frames) < 10:
        return None
    return Trajectory(
        time_usec=np.asarray([fp.time_usec for fp in frames], np.int64),
        frame_id=np.asarray([fp.frame_id for fp in frames], np.int64),
        is_lost=np.zeros(len(frames), bool),
        translations=np.stack([fp.camera_center() for fp in frames]),
        rotations=np.stack([fp.camera_to_world_quat() for fp in frames]),
    )


def postprocess_segment(
    trajectory: Trajectory, rotation_smooth_sigma: int = 0
) -> Optional[Trajectory]:
    """Smoothing + PCA flattening (TrackImageSequence post-loop,
    track_image_sequence.cc:63-110). Returns None if the segment fails the
    flatness test."""
    if rotation_smooth_sigma > 0:
        trajectory.rotations = np.asarray(
            smooth_quaternion_sequence(trajectory.rotations, rotation_smooth_sigma)
        )
    result = flatten_trajectory(trajectory)
    if result is None:
        return None
    plane, directions, angles = result
    trajectory.plane = plane
    trajectory.planar_directions = directions
    trajectory.turn_angles = angles
    return trajectory


def track_video_segments(
    frames: Iterator[VideoFrame],
    settings: CameraSettings,
    out_dir: str,
    rotation_smooth_sigma: int = 0,
    image_scale: float = 1.0,
    make_tracker=None,
    feature_batch_size: int = 8,
) -> Tuple[int, int]:
    """Segment loop (optical_trajectories.cc:91-111): fresh tracker per
    segment, restart after LOST, one JSON per valid segment.

    With the default tracker, features are prefetched in device batches of
    ``feature_batch_size`` (pass 0 to disable). Returns (segments_written,
    frames_consumed).
    """
    os.makedirs(out_dir, exist_ok=True)
    if make_tracker is None:
        make_tracker = lambda: tracker_from_settings(settings, image_scale)
        if feature_batch_size > 0:
            probe = make_tracker()
            frames = prefetch_features(
                frames, probe.camera, probe.config, feature_batch_size
            )
    segment = 0
    consumed = 0
    exhausted = False
    while not exhausted:
        tracker = make_tracker()
        fed = 0
        while True:
            frame = next(frames, None)
            if frame is None:
                exhausted = True
                break
            consumed += 1
            fed += 1
            if frame.features is not None:
                kp_norm, desc, valid, *rest = frame.features
                kp_level, kp_angle = rest if rest else (None, None)
                state = tracker.process_features(
                    kp_norm, desc, valid, frame.frame_id, frame.time_usec,
                    kp_level=kp_level, kp_angle=kp_angle,
                )
            else:
                state = tracker.process_frame(
                    frame.gray, frame.frame_id, frame.time_usec
                )
            if state == LOST:
                break
        tracker.finalize()  # terminal loop-closure pass (max revisit overlap)
        trajectory = trajectory_from_tracker(tracker)
        if trajectory is not None:
            processed = postprocess_segment(trajectory, rotation_smooth_sigma)
            if processed is not None:
                write_trajectory(
                    processed,
                    os.path.join(out_dir, f"trajectory-{segment:04d}.json"),
                )
                segment += 1
            else:
                # Same silent-drop as the reference's lambda3 test, but say
                # so: "0 segments" on a well-tracked video reads like a
                # tracking failure otherwise.
                print(
                    f"segment with {len(trajectory)} tracked frames rejected "
                    "by the trajectory-plane flatness test (not planar)"
                )
        if fed == 0:
            break
    return segment, consumed
