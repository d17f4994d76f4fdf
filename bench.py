"""Benchmark: fit_motion sliding-window calibration throughput on one chip.

Workload: a synthetic 300-second ride (dual 200 Hz IMU streams + 1 Hz GPS,
physically consistent), processed by the full fit_motion pipeline — host
piece construction + batched multi-start Gauss-Newton solve + trajectory
replay + cross-window reductions + smoothing (pilotguru_tpu.calib).

Metric: ride-seconds processed per wall-clock second (higher is better).
The reference publishes no timing numbers (BASELINE.md: "published: {}");
its stated target envelope is >10x real-time processing per chip, so
vs_baseline is reported against 1x real-time (vs_baseline == value).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    from pilotguru_tpu.calib import FitMotionConfig, fit_motion_arrays

    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    rot_t, rates, acc_t, accs, gps_t, gps_v, duration = make_ride()
    config = FitMotionConfig(optimization_iters=30, dtype=dtype)

    def run():
        result = fit_motion_arrays(
            rot_t, rates, acc_t, accs, gps_t, gps_v, config
        )
        return result

    # Remote TPU backends occasionally throw transient INTERNAL errors on a
    # fresh program; retry the warmup a couple of times before giving up so
    # one blip doesn't void the measurement.
    for attempt in range(3):
        try:
            run()  # compile warmup (XLA caches on identical shapes)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5.0)
    start = time.perf_counter()
    result = run()
    elapsed = time.perf_counter() - start

    # Sanity: velocities must track the synthetic ground truth, otherwise the
    # speed number is meaningless.
    t_sec = (result.velocity_times_usec - 1_000_000) * 1e-6
    want = 9.0 + 3.0 * np.sin(2 * np.pi * t_sec / 37.0)
    rmse = float(np.sqrt(np.mean((result.velocities_m_s - want) ** 2)))
    if rmse > 0.5:
        raise RuntimeError(f"bench output quality check failed: RMSE {rmse}")

    value = duration / elapsed
    print(
        json.dumps(
            {
                "metric": "fit_motion_ride_seconds_per_second",
                "value": round(value, 2),
                "unit": "ride_sec/sec (300s ride, 2x200Hz IMU, 1Hz GPS)",
                "vs_baseline": round(value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
