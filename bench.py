"""Benchmarks for every BASELINE.json config measurable on one chip.

Emits one JSON line per metric; the HEADLINE metric (fit_motion ride-seconds
per wall-second) is printed LAST so a single-line parser still records the
primary number. All lines land in the driver's recorded tail either way.

Configs covered (BASELINE.json "configs"):
  1. fit_motion calibration throughput on a synthetic 300 s ride
     (+ velocity RMSE vs the ride's analytic ground truth — the
     "velocity RMSE vs GPS" metric).
  2. optical_trajectories visual odometry on a rendered 1280x720 parallax
     ride at the reference feature budget (2000 features / 8 levels,
     /root/reference/src/calibrate.cc:518-531) — frames/sec per chip,
     including decode, extraction, matching, pose optimization and BA.
  3. PilotNet ensemble training throughput — examples/sec through the full
     jitted train step (on-device augmentation + fwd/bwd + update).

The reference publishes no timing numbers (BASELINE.md: "published: {}");
its stated envelope is >10x real-time processing per chip. vs_baseline is
therefore reported against 1x real-time for throughput metrics (value in
real-time multiples) and against the 0.5 m/s acceptance bar for RMSE.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

# Persistent XLA compilation cache: the remote-chip tunnel pays 20-40 s per
# compile, and the VO tracker alone compiles dozens of shape-bucketed
# programs. The cache lives in the repo (gitignored) so repeat bench runs —
# including the driver's end-of-round run after an in-session warm run —
# skip every already-seen program.
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_compile_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def make_ride(duration_sec=300.0, imu_hz=200.0, gps_hz=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t0 = 1_000_000

    def grid(hz, phase):
        n = int(duration_sec * hz)
        return t0 + phase + (np.arange(n) * (1e6 / hz)).astype(np.int64)

    rot_t = grid(imu_hz, 0)
    acc_t = grid(imu_hz, int(0.37 * 1e6 / imu_hz))
    gps_t = grid(gps_hz, 137)

    def t_sec(t):
        return (t - t0) * 1e-6

    speed = lambda t: 9.0 + 3.0 * np.sin(2 * np.pi * t / 37.0)
    dspeed = lambda t: 3.0 * (2 * np.pi / 37.0) * np.cos(2 * np.pi * t / 37.0)
    heading = lambda t: 0.6 * np.sin(2 * np.pi * t / 23.0)
    yaw = lambda t: 0.6 * (2 * np.pi / 23.0) * np.cos(2 * np.pi * t / 23.0)

    rates = np.zeros((rot_t.size, 3))
    rates[:, 2] = yaw(t_sec(rot_t))

    ta = t_sec(acc_t)
    th = heading(ta)
    s, ds, w = speed(ta), dspeed(ta), yaw(ta)
    a_world = np.stack(
        [ds * np.cos(th) - s * np.sin(th) * w,
         ds * np.sin(th) + s * np.cos(th) * w,
         np.full_like(ta, 9.81)],
        axis=-1,
    )
    cos_t, sin_t = np.cos(th), np.sin(th)
    accs = np.stack(
        [cos_t * a_world[:, 0] + sin_t * a_world[:, 1],
         -sin_t * a_world[:, 0] + cos_t * a_world[:, 1],
         a_world[:, 2]],
        axis=-1,
    )
    return rot_t, rates, acc_t, accs, gps_t, speed(t_sec(gps_t)), duration_sec


def _retry(fn, attempts=3, delay=5.0):
    """Remote TPU backends occasionally throw transient INTERNAL errors on a
    fresh program; retry warmups so one blip doesn't void the measurement."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception:
            if attempt == attempts - 1:
                raise
            time.sleep(delay)


def bench_fit_motion():
    import jax
    import jax.numpy as jnp

    from pilotguru_tpu.calib import FitMotionConfig, fit_motion_arrays

    if jax.default_backend() == "cpu":
        # Without x64 enabled, requested float64 arrays silently downcast to
        # float32 and the CPU bench would not run at the precision it claims.
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    rot_t, rates, acc_t, accs, gps_t, gps_v, duration = make_ride()
    config = FitMotionConfig(optimization_iters=30, dtype=dtype)

    def run():
        return fit_motion_arrays(rot_t, rates, acc_t, accs, gps_t, gps_v, config)

    _retry(run)  # compile warmup (XLA caches on identical shapes)
    # Best-of-3: remote-tunnel round-trip jitter adds ~10% run-to-run
    # spread (measured 428-475 ride-s/s across 5 back-to-back runs), and
    # the first post-warmup run is reliably the slowest; the max is the
    # honest steady-state throughput (r01's 515 vs r02's 421 was this
    # jitter + run ordering, not a code regression — no calib/ code
    # changed between the rounds).
    elapsed = np.inf
    for _ in range(3):
        start = time.perf_counter()
        result = run()
        elapsed = min(elapsed, time.perf_counter() - start)

    t_sec = (result.velocity_times_usec - 1_000_000) * 1e-6
    want = 9.0 + 3.0 * np.sin(2 * np.pi * t_sec / 37.0)
    rmse = float(np.sqrt(np.mean((result.velocities_m_s - want) ** 2)))
    if rmse > 0.5:
        raise RuntimeError(f"bench output quality check failed: RMSE {rmse}")

    value = duration / elapsed
    rmse_line = {
        "metric": "fit_motion_velocity_rmse_m_s",
        "value": round(rmse, 4),
        "unit": "m/s RMSE vs analytic ground-truth speed (lower is better)",
        "vs_baseline": round(0.5 / max(rmse, 1e-9), 2),
    }
    headline = {
        "metric": "fit_motion_ride_seconds_per_second",
        "value": round(value, 2),
        "unit": "ride_sec/sec (300s ride, 2x200Hz IMU, 1Hz GPS)",
        "vs_baseline": round(value, 2),
    }
    return rmse_line, headline


def bench_corpus():
    """Corpus-scale calibration (BASELINE stretch config): N rides through
    the bucketed fit_motion_corpus path — one compiled executable reused
    across every ride (vs the reference's one PROCESS per ride,
    python/preprocess_all.py:20-37)."""
    import jax
    import jax.numpy as jnp

    from pilotguru_tpu.calib import FitMotionConfig
    from pilotguru_tpu.calib.corpus import RideArrays, fit_motion_corpus

    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    num_rides = 8
    rides = []
    total_ride_sec = 0.0
    for seed in range(num_rides):
        rot_t, rates, acc_t, accs, gps_t, gps_v, duration = make_ride(seed=seed)
        rides.append(RideArrays(rot_t, rates, acc_t, accs, gps_t, gps_v))
        total_ride_sec += duration
    config = FitMotionConfig(optimization_iters=30, dtype=dtype)

    _retry(lambda: fit_motion_corpus(rides[:1], config))  # compile warmup
    elapsed = np.inf
    for _ in range(2):
        start = time.perf_counter()
        results = fit_motion_corpus(rides, config)
        elapsed = min(elapsed, time.perf_counter() - start)
    assert len(results) == num_rides

    # Quality gate on every ride (same analytic ground truth as the
    # single-ride bench — make_ride varies only the noise seed).
    for result in results:
        t_sec = (result.velocity_times_usec - 1_000_000) * 1e-6
        want = 9.0 + 3.0 * np.sin(2 * np.pi * t_sec / 37.0)
        rmse = float(np.sqrt(np.mean((result.velocities_m_s - want) ** 2)))
        if rmse > 0.5:
            raise RuntimeError(f"corpus ride RMSE check failed: {rmse}")

    value = total_ride_sec / elapsed
    return {
        "metric": "fit_motion_corpus_ride_seconds_per_second",
        "value": round(value, 2),
        "unit": (
            f"ride_sec/sec over a {num_rides}-ride corpus (300s each, "
            "2x200Hz IMU, 1Hz GPS; one compiled executable reused across "
            "rides — the reference runs one process per ride)"
        ),
        "vs_baseline": round(value, 2),
    }


def bench_vo():
    """optical_trajectories on a rendered 720p ride at reference budget."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.synthetic import render_parallax_video

    from pilotguru_tpu.vo.camera import CameraSettings
    from pilotguru_tpu.vo.pipeline import track_video_segments, video_frames

    def note(msg, _t0=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"# vo +{now - _t0[0]:.0f}s: {msg}", file=sys.stderr, flush=True)
        _t0[0] = now

    tmp = tempfile.mkdtemp(prefix="pgtpu_bench_")
    video = os.path.join(tmp, "ride720p.mp4")
    num_frames = 150
    fx, fy, cx, cy, _ = render_parallax_video(
        video, width=1280, height=720, frames=num_frames, num_points=2400,
        fx=700.0, period_frames=60.0,
    )
    note("rendered 150-frame 720p ride")
    settings = CameraSettings(
        fx=fx, fy=fy, cx=cx, cy=cy,
        orb_features=2000, orb_levels=8,
    )

    def run():
        return track_video_segments(
            video_frames(video), settings, os.path.join(tmp, "out"),
            feature_batch_size=8,
        )

    # Warmup on a short prefix so steady-state throughput is measured, not
    # XLA compilation (shape-keyed caches carry over to the timed run).
    warm_video = os.path.join(tmp, "warm.mp4")
    render_parallax_video(
        warm_video, width=1280, height=720, frames=30, num_points=2400,
        fx=700.0, period_frames=60.0,
    )
    _retry(
        lambda: track_video_segments(
            video_frames(warm_video), settings, os.path.join(tmp, "warm_out"),
            feature_batch_size=8,
        )
    )
    note("warmup 30-frame tracked run (compiles)")

    # Pre-compile every local-map bucket the tracker can grow into
    # (tracking.py _device_map: {1024, 2048, 4096}); a mid-run bucket jump
    # would otherwise land a 20-40 s tunnel compile inside the timed run.
    from pilotguru_tpu.vo.pipeline import tracker_from_settings

    _retry(lambda: tracker_from_settings(settings).warm_track_buckets())
    note("pre-compiled local-map buckets")

    start = time.perf_counter()
    segments, consumed = run()
    elapsed = time.perf_counter() - start
    note(f"timed 150-frame tracked run ({segments} segments)")
    if segments < 1:
        raise RuntimeError("VO bench produced no accepted trajectory segment")
    fps = consumed / elapsed

    # Device-limited throughput: steady-state per-frame DEVICE work
    # (pyramid ORB extraction + fused track step) timed on staged inputs.
    # The end-to-end number above is wall clock through this harness's
    # remote-chip tunnel, whose ~30 ms round-trip latency bounds any
    # sequential tracker regardless of chip speed; a locally-attached chip
    # runs at the device-limited rate.
    import cv2
    import jax
    import jax.numpy as jnp

    from pilotguru_tpu.vo.features import extract_orb_features_batch
    from pilotguru_tpu.vo.tracking import fused_track_step

    cap = cv2.VideoCapture(video)
    grays = []
    for _ in range(8):
        ok, frame = cap.read()
        grays.append(
            cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
        )
    cap.release()
    batch = jnp.asarray(np.stack(grays))

    # Device timing here CHAINS iterations inside one jitted fori_loop and
    # pulls a single scalar: through the remote tunnel, block_until_ready
    # returns before execution finishes (measured: "12 ms of device work"
    # timed as 0.03 ms), and any per-call host pull is bandwidth-bound, so
    # only an on-device loop isolates true device throughput.
    def device_ms_per_iter(body, template, iters):
        # Two chain lengths cancel the fixed per-call cost (tunnel RTT
        # ~28 ms + dispatch): cost(iters) - cost(iters/2) = (iters/2) x
        # per-iteration device work, with the additive floor subtracted
        # exactly (measured: a scalar-body chain times at 0.87 ms/iter at
        # iters=32 — pure RTT, zero device work).
        def chain(n):
            @jax.jit
            def chained(x):
                def it(i, carry):
                    return body(x, carry) * 1e-20
                return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

            _retry(lambda: float(np.asarray(chained(template))))  # compile+run
            best = np.inf
            for _ in range(3):
                start = time.perf_counter()
                float(np.asarray(chained(template)))
                best = min(best, time.perf_counter() - start)
            return best

        half = max(iters // 2, 1)
        return max(chain(2 * half) - chain(half), 1e-6) / half * 1e3

    # Pallas FAST+NMS parity on the REAL chip (the unit test only runs
    # interpret mode on CPU): assert the production fused kernel matches
    # the jnp reference once, then race both pairs so the shipped default
    # (features._fast_impl: pallas on TPU) stays justified by numbers.
    from pilotguru_tpu.vo.features import _fast_impl, fast_scores, nms3x3
    from pilotguru_tpu.vo.fast_pallas import fast_nms_pallas

    fast_note = f"fast_impl={_fast_impl()}"
    if jax.default_backend() == "tpu":
        ref_raw = np.asarray(fast_scores(batch[0], 20.0 / 255.0))
        ref_nms = np.asarray(nms3x3(jnp.asarray(ref_raw)))
        pal_raw, pal_nms = fast_nms_pallas(batch[0], 20.0 / 255.0)
        pal_raw_np, pal_nms_np = np.asarray(pal_raw), np.asarray(pal_nms)
        np.testing.assert_allclose(pal_raw_np, ref_raw, atol=1e-5)
        # NMS compares scores EXACTLY, so the two implementations' ulp-level
        # accumulation-order differences (measured <=3e-6 on chip) can flip
        # keep/suppress wherever two neighbors tie to within an ulp. Assert
        # (a) the fused kernel's NMS is bit-identical to nms3x3 over its own
        # raw scores (semantic parity, no cross-impl float sensitivity), and
        # (b) every cross-impl disagreement sits in that tie zone.
        self_nms = np.asarray(nms3x3(pal_raw))
        assert (self_nms == pal_nms_np).all(), "fused NMS != nms3x3(own raw)"
        flips = np.argwhere(np.abs(pal_nms_np - ref_nms) > 1e-5)
        if flips.size:
            pad = np.pad(ref_raw, 1, constant_values=0.0)
            win = np.stack(
                [
                    pad[dy : dy + ref_raw.shape[0], dx : dx + ref_raw.shape[1]]
                    for dy in range(3)
                    for dx in range(3)
                ]
            ).max(axis=0)
            gap = np.abs(ref_raw - win)[flips[:, 0], flips[:, 1]]
            assert gap.max() <= 1e-5, (
                f"{flips.shape[0]} NMS flips beyond the ulp tie zone "
                f"(max |score - 3x3 max| = {gap.max():.2e})"
            )

        # Sub-millisecond stages need long chains: the two-chain difference
        # must clear the tunnel's run-to-run noise (a few ms), so 128 iters
        # puts the half-chain delta at ~25x the stage cost.
        def jnp_pair(x, c):
            raw = fast_scores(x + c, 20.0 / 255.0)
            return raw.sum() + nms3x3(raw).sum()

        def pal_pair(x, c):
            raw, nms = fast_nms_pallas(x + c, 20.0 / 255.0)
            return raw.sum() + nms.sum()

        jnp_ms = device_ms_per_iter(jnp_pair, batch[0], 128)
        pal_ms = device_ms_per_iter(pal_pair, batch[0], 128)
        fast_note += (
            f", fast+nms 720p jnp {jnp_ms:.2f} ms vs pallas {pal_ms:.2f} ms"
        )
        note("pallas parity + FAST+NMS race")

    kps = _retry(
        lambda: extract_orb_features_batch(
            batch, num_levels=8, total_budget=2000
        )
    )
    extract_ms = device_ms_per_iter(
        lambda x, c: extract_orb_features_batch(
            x + c, num_levels=8, total_budget=2000
        ).xy.sum(),
        batch, 8,
    ) / batch.shape[0]
    note("batched extract timing")

    # The tracker matches against its COMPACT local-map mirror (bucketed
    # power-of-two, tracking.py _device_map); 2048 is the bucket a
    # reference-budget ride settles into (6-keyframe window at 2000
    # feat/frame), so that is the honest per-frame device cost.
    track_bucket = 2048
    rng = np.random.default_rng(0)
    m_pts = jnp.asarray(rng.normal(size=(track_bucket, 3)).astype(np.float32))
    m_desc = jnp.asarray(
        rng.integers(0, 2, size=(track_bucket, 256)).astype(np.uint8)
    )
    m_cand = jnp.asarray(np.ones(track_bucket, bool))
    pose = jnp.asarray(np.zeros(6, np.float32))
    m_level = jnp.asarray(
        rng.integers(0, 8, size=track_bucket).astype(np.int32)
    )
    kp = kps.xy[0].astype(jnp.float32)
    kd = kps.descriptors[0]
    kv = kps.valid[0]
    klevel = kps.level[0]

    track_ms = device_ms_per_iter(
        lambda p, c: fused_track_step(
            m_pts, m_desc, m_cand, m_level,
            p + c, kp, kd, kv, klevel,
            search_radius=0.08, max_distance=100,
        ).sum(),
        pose, 64,
    )
    note("fused track timing")

    # Keyframe-cadence device work, AMORTIZED (VERDICT r3 item 2): one
    # jitted program per iteration runs the full per-keyframe device suite
    # — triangulation/creation (fused_create_points), duplicate fusion over
    # the whole arena (fused_project_match), local bundle adjustment at the
    # tracker's window shapes, and the loop-detection vote sweep — i.e.
    # everything LocalMapping.cc:170-206,454-525 + LoopClosing's detect run
    # per keyframe. Steady-state cadence is one keyframe per
    # keyframe_max_gap=8 frames (PARITY soak: 17 KFs / 150 frames).
    from pilotguru_tpu.vo.ba import BAProblem
    from pilotguru_tpu.vo.loopclosing import _vote_counts
    from pilotguru_tpu.vo.tracking import (
        _bundle_adjust,
        fused_create_points,
        fused_project_match,
    )

    arena = 4096
    a_pts = jnp.asarray(rng.normal(size=(arena, 3)).astype(np.float32))
    a_desc = jnp.asarray(
        rng.integers(0, 2, size=(arena, 256)).astype(np.uint8)
    )
    a_cand = jnp.asarray(np.ones(arena, bool))
    a_level = jnp.asarray(rng.integers(0, 8, size=arena).astype(np.int32))
    kangle = kps.angle[0]
    kun = kv  # "unmatched" masks — same shape, cost identical
    delta = jnp.asarray(np.array([0, 0.01, 0, 0, 0, 0.1], np.float32))
    # Local BA at the tracker's bucket shapes (6-keyframe window, ~1.2k
    # points / 256-bucket, 2k observations / 1024-bucket) on a CONSISTENT
    # warm-started
    # geometry (projected points + pixel noise, poses/points perturbed at
    # the level the previous window's solution leaves them) — that is what
    # keyframe-cadence BA actually solves; a random-soup problem never
    # converges and would overstate the LM iteration count (the solver
    # carries the reference's 5+10 budget with g2o-style early exit).
    num_k, num_m, num_o = 6, 1280, 2048
    ba_pts = np.stack(
        [rng.uniform(-2, 2, num_m), rng.uniform(-1.5, 1.5, num_m),
         rng.uniform(4, 12, num_m)], axis=1,
    ).astype(np.float32)
    ba_poses = np.zeros((num_k, 6), np.float32)
    ba_poses[:, 5] = np.arange(num_k) * 0.1
    ba_poses[:, 1] = np.arange(num_k) * 0.01
    ba_op = rng.integers(0, num_k, size=num_o).astype(np.int32)
    ba_ol = rng.integers(0, num_m, size=num_o).astype(np.int32)
    from pilotguru_tpu.vo.pose import rotvec_to_matrix as _r2m

    ba_rs = np.asarray(jax.vmap(_r2m)(jnp.asarray(ba_poses[:, :3])))
    ba_cam = (
        np.einsum("oij,oj->oi", ba_rs[ba_op], ba_pts[ba_ol])
        + ba_poses[ba_op, 3:]
    )
    ba_uv = (
        ba_cam[:, :2] / ba_cam[:, 2:3]
        + rng.normal(scale=0.002, size=(num_o, 2))
    ).astype(np.float32)
    problem = BAProblem(
        jnp.asarray(
            ba_poses + rng.normal(scale=1e-3, size=ba_poses.shape)
        ).astype(jnp.float32),
        jnp.asarray(
            ba_pts + rng.normal(scale=5e-3, size=ba_pts.shape)
        ).astype(jnp.float32),
        jnp.asarray(ba_op),
        jnp.asarray(ba_ol),
        jnp.asarray(ba_uv),
        jnp.asarray(np.ones(num_o, bool)),
        jnp.asarray(np.ones(num_m, bool)),
        jnp.asarray(np.ones(num_o, np.float32)),
    )
    # Vote sweep against 24 stored keyframes (a 150-frame segment's stack).
    kf_stack_desc = jnp.asarray(
        rng.integers(0, 2, size=(24, 2000, 256)).astype(np.uint8)
    )
    kf_stack_valid = jnp.asarray(np.ones((24, 2000), bool))

    def keyframe_suite(p, c):
        # Every sub-program must depend on the chain carry ``c`` or XLA
        # hoists it out of the timing loop.
        d = delta + p * 0.0 + c
        created = fused_create_points(
            kd, kun, kp + c, klevel, kangle,
            kd, kun, kp, klevel, kangle,
            d, jnp.zeros(6, jnp.float32) + c,
            min_parallax_cos=0.9999, epipolar_gate=0.003,
        )
        fused = fused_project_match(
            a_pts + c, a_desc, a_cand, a_level, d,
            kd, kp, kv, klevel,
            search_radius=0.007, max_distance=50,
        )
        ba = _bundle_adjust(
            problem._replace(poses6=problem.poses6 + c)
        )
        votes = _vote_counts(
            kd, kv & (c < 1e18), kf_stack_desc, kf_stack_valid
        )
        return (
            created.sum() + fused.sum() + ba.poses6.sum()
            + votes.sum().astype(jnp.float32)
        )

    kf_ms = device_ms_per_iter(keyframe_suite, delta, 16)
    note("keyframe-cadence suite timing")

    cadence = 8.0  # frames per keyframe (keyframe_max_gap)
    amortized_ms_720 = extract_ms + track_ms + kf_ms / cadence
    device_fps = 1000.0 / amortized_ms_720

    # 1080p (the BASELINE north star resolution): extraction is the
    # resolution-bound stage; track/keyframe work depends on feature and
    # map budgets only.
    video1080 = os.path.join(tmp, "ride1080p.mp4")
    render_parallax_video(
        video1080, width=1920, height=1080, frames=8, num_points=2400,
        fx=1050.0, period_frames=60.0,
    )
    cap = cv2.VideoCapture(video1080)
    grays1080 = []
    for _ in range(8):
        ok, frame = cap.read()
        grays1080.append(
            cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
        )
    cap.release()
    batch1080 = jnp.asarray(np.stack(grays1080))
    _retry(
        lambda: extract_orb_features_batch(
            batch1080, num_levels=8, total_budget=2000
        )
    )
    extract1080_ms = device_ms_per_iter(
        lambda x, c: extract_orb_features_batch(
            x + c, num_levels=8, total_budget=2000
        ).xy.sum(),
        batch1080, 8,
    ) / batch1080.shape[0]
    note("1080p extract timing")
    amortized_ms_1080 = extract1080_ms + track_ms + kf_ms / cadence
    device_fps_1080 = 1000.0 / amortized_ms_1080

    return (
        {
            "metric": "vo_device_frames_per_sec_720p",
            "value": round(device_fps, 1),
            "unit": (
                "frames/sec device-limited, amortized INCLUDING "
                f"keyframe-cadence work (extract {extract_ms:.1f} ms + "
                f"track {track_ms:.1f} ms per frame + keyframe suite "
                f"{kf_ms:.1f} ms [create+fuse+localBA+loop votes] per "
                f"{cadence:.0f} frames; 2000 feat / 8 levels, 2048-point "
                f"local-map bucket of a 4096 arena; {fast_note})"
            ),
            "vs_baseline": round(device_fps / 30.0, 2),
        },
        {
            "metric": "vo_device_frames_per_sec_1080p",
            "value": round(device_fps_1080, 1),
            "unit": (
                "frames/sec device-limited at 1920x1080 (north-star "
                f"resolution), amortized (extract {extract1080_ms:.1f} ms "
                f"+ track {track_ms:.1f} ms + keyframe suite "
                f"{kf_ms:.1f} ms / {cadence:.0f} frames)"
            ),
            "vs_baseline": round(device_fps_1080 / 30.0, 2),
        },
        {
            "metric": "vo_optical_trajectories_fps_720p",
            "value": round(fps, 2),
            "unit": (
                "frames/sec end-to-end (1280x720, 2000 feat / 8 levels, "
                "decode+track+BA+loop, chunked device tracking; wall clock "
                "through a ~30 ms RTT remote-chip tunnel)"
            ),
            "vs_baseline": round(fps / 30.0, 2),
        },
    )


def bench_training():
    """PilotNet ensemble train-step throughput, batch-size sweep.

    Sweeps batch 128 -> 4096 and reports the saturated examples/sec (the
    reference trains at batch 128 on one GPU with host-side numpy batches,
    python/train.py; the TPU train step is fed device-resident batches as a
    production input pipeline would). An achieved-FLOPs estimate from XLA's
    own cost analysis turns the raw number into a judgment: PilotNet is a
    ~70 MFLOP/example model, so examples/sec alone says nothing about chip
    utilization.
    """
    import jax
    import jax.numpy as jnp

    from pilotguru_tpu.ml import augmentation as aug
    from pilotguru_tpu.ml import models, training

    options = {
        models.NET_NAME: models.NVIDIA_NET_NAME,
        models.NET_HEAD_DIMS: 10,
        models.LABEL_DIMENSIONS: 1,
        models.DROPOUT_PROB: 0.0,
        models.LAYER_BLOCKS_OPTIONS: models.DEFAULT_LAYER_BLOCKS_OPTIONS,
    }
    bias = [{"input_name": models.FORWARD_AXIS, "input_dims": 3}]
    model = models.make_network(options, bias)
    num_nets = 2
    settings = training.TrainSettings(
        epochs=1,
        batch_size=128,
        augment=aug.AugmentSettings(
            target_width=200,
            max_horizontal_shift_pixels=3,
            horizontal_label_shift_rate=(0.1,),
        ),
    )
    tx = training.make_optimizer(settings.optimizer, settings.learning_rate)
    example = {
        models.FRAME_IMG: np.zeros((1, 66, 200, 3), np.float32),
        models.FORWARD_AXIS: np.zeros((1, 3), np.float32),
    }
    train_step = training.make_train_step(model, tx, settings)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    batches = [128, 512, 2048, 4096] if jax.default_backend() != "cpu" else [128]
    sweep = []
    flops_per_step = None
    for batch in batches:
        inputs = {
            models.FRAME_IMG: jax.device_put(
                rng.uniform(size=(batch, 66, 210, 3)).astype(np.float32)
            ),
            models.FORWARD_AXIS: jax.device_put(
                rng.normal(size=(batch, 3)).astype(np.float32)
            ),
        }
        labels = jax.device_put(
            rng.normal(size=(batch, 1)).astype(np.float32)
        )
        weights = jnp.ones((num_nets, batch), jnp.float32)
        use = jnp.ones((num_nets,), bool)
        # Fresh state per batch size: the train step donates its state
        # argument, so a shared initial state would reuse donated buffers.
        state = training.init_ensemble(model, example, num_nets, tx)

        def step(state, k):
            state, losses, _ = train_step(
                state, inputs, labels, weights, use, k
            )
            return state, losses

        state, losses = _retry(lambda: step(state, key))  # compile warmup
        jax.block_until_ready(losses)
        if batch == batches[-1]:
            # Lower the ALREADY-jitted train step (same HLO as the warmup
            # call -> compile-cache hit); re-jitting the closure here would
            # compile a second multi-minute program through the tunnel.
            try:
                cost = (
                    train_step.lower(state, inputs, labels, weights, use, key)
                    .compile()
                    .cost_analysis()
                )
                flops_per_step = cost.get("flops")
            except Exception as exc:
                print(
                    f"# training cost_analysis unavailable: {exc}",
                    file=sys.stderr,
                )
                flops_per_step = None
        steps = max(4, 2560 // batch)
        start = time.perf_counter()
        for i in range(steps):
            state, losses = step(state, jax.random.fold_in(key, i))
        jax.block_until_ready(losses)
        elapsed = time.perf_counter() - start
        sweep.append((batch, steps * batch / elapsed, steps / elapsed))

    batch, eps, steps_per_sec = max(sweep, key=lambda s: s[1])
    sweep_note = ", ".join(f"b{b}:{v:.0f}" for b, v, _ in sweep)
    if flops_per_step:
        # cost_analysis counts the whole step at the LAST batch size.
        scaled = flops_per_step * (batch / batches[-1])
        tflops = scaled * steps_per_sec / 1e12
        flops_note = f", ~{tflops:.2f} TFLOP/s achieved (XLA cost model)"
        if jax.default_backend() == "tpu":
            # TPU v5e peak: 197 bf16 TFLOP/s per chip.
            flops_note += f" = {100.0 * tflops / 197.0:.1f}% MFU of 197 peak"
    else:
        flops_note = ""
    return {
        "metric": "train_examples_per_sec",
        "value": round(eps, 1),
        "unit": (
            f"examples/sec per chip (PilotNet x{num_nets} ensemble, "
            f"saturating batch {batch}, on-device augmentation, "
            f"fwd+bwd+update; sweep {sweep_note}{flops_note})"
        ),
        "vs_baseline": round(eps / 4395.0, 2),  # r02's batch-128 number
    }


def _previous_round_metrics():
    """Load the newest BENCH_r*.json recorded by the driver and parse its
    metric lines, so the current run can flag per-metric regressions
    (VERDICT r4 item 5: the fit_motion 501->362 drift went unexplained for
    a round because nothing compared against the prior record)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best_round, path = -1, None
    for candidate in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", candidate)
        if m and int(m.group(1)) > best_round:
            best_round, path = int(m.group(1)), candidate
    if path is None:
        return {}, -1
    try:
        with open(path) as f:
            record = json.load(f)
        metrics = {}
        for line in record.get("tail", "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in entry and "value" in entry:
                metrics[entry["metric"]] = float(entry["value"])
        return metrics, best_round
    except Exception:
        return {}, -1


# Metrics where LOWER is better (regression = value rose >15%).
_LOWER_IS_BETTER = {"fit_motion_velocity_rmse_m_s"}


def flag_regressions(lines):
    """Annotate each metric line with a ``regression`` field when it moved
    >15% the wrong way vs the previous round's recorded value."""
    previous, prev_round = _previous_round_metrics()
    if not previous:
        return
    for line in lines:
        prev = previous.get(line["metric"])
        if prev is None or prev == 0:
            continue
        value = float(line["value"])
        if line["metric"] in _LOWER_IS_BETTER:
            regressed = value > prev * 1.15
        else:
            regressed = value < prev * 0.85
        if regressed:
            line["regression"] = (
                f"{prev} (r{prev_round:02d}) -> {value}"
            )
            print(
                f"# REGRESSION {line['metric']}: {prev} (r{prev_round:02d}) "
                f"-> {value} (>15% worse)",
                file=sys.stderr,
                flush=True,
            )


def main():
    lines = []
    failures = []
    for name, fn in [
        ("vo", bench_vo),
        ("training", bench_training),
        ("corpus", bench_corpus),
    ]:
        stage_start = time.perf_counter()
        try:
            result = fn()
            lines.extend(result if isinstance(result, tuple) else [result])
        except Exception as exc:  # secondary benches must not sink the run
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
        print(
            f"# stage {name}: {time.perf_counter() - stage_start:.0f}s",
            file=sys.stderr,
            flush=True,
        )
    stage_start = time.perf_counter()
    rmse_line, headline = bench_fit_motion()
    print(
        f"# stage fit_motion: {time.perf_counter() - stage_start:.0f}s",
        file=sys.stderr,
        flush=True,
    )
    lines.append(rmse_line)
    for failure in failures:
        print(f"# bench skipped — {failure}", file=sys.stderr)
    lines.append(headline)  # headline LAST for single-line parsers
    flag_regressions(lines)
    for line in lines:
        print(json.dumps(line))


if __name__ == "__main__":
    main()
