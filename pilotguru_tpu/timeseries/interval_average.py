"""Time-weighted interval averages of a sampled series, vectorized over queries.

The reference computes, per query interval [t0, t1], the average of the
piecewise-linear interpolant of the series over that interval, by summing
whole-interval trapezoids plus linearly-interpolated partial end intervals
(TimeSeries::TimeAveragedValue,
/root/reference/include/interpolation/time_series.hpp:134-189).

That is exactly (F(t1) - F(t0)) / (t1 - t0) where F is the cumulative
trapezoidal integral of the interpolant — which is how it is computed here,
one gather + fused arithmetic for *all* query intervals at once instead of a
linear scan per query. Used by annotate_frames (src/annotate_frames.cc:56-68)
to average a series between consecutive video frames.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def time_averaged_values(
    values,
    times_usec,
    query_start_usec,
    query_end_usec,
    dtype=jnp.float64,
):
    """Average the linear interpolant of (times, values) over query intervals.

    Args:
      values: [N] series values.
      times_usec: [N] sorted int64 sample times (microseconds).
      query_start_usec, query_end_usec: [Q] int64 interval bounds, start < end.

    Returns:
      averages: [Q] float array (garbage where invalid).
      valid: [Q] bool — query interval fully covered by the series, matching
        the reference validity rule (time_series.hpp:142-145).
    """
    times_np = np.asarray(times_usec, dtype=np.int64)
    q0_np = np.asarray(query_start_usec, dtype=np.int64)
    q1_np = np.asarray(query_end_usec, dtype=np.int64)

    # Work in seconds relative to the series start to keep float precision.
    t0 = int(times_np[0])
    ts = jnp.asarray((times_np - t0) * 1e-6, dtype=dtype)  # [N]
    v = jnp.asarray(values, dtype=dtype)  # [N]
    q0 = jnp.asarray((q0_np - t0) * 1e-6, dtype=dtype)
    q1 = jnp.asarray((q1_np - t0) * 1e-6, dtype=dtype)

    valid = jnp.asarray((q0_np >= times_np[0]) & (q1_np <= times_np[-1]))

    # Cumulative trapezoidal integral at the sample points.
    dt = ts[1:] - ts[:-1]
    seg = 0.5 * dt * (v[1:] + v[:-1])
    cum = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(seg)])  # [N]

    # Most recent sample index <= t (clamped into [0, N-2] for interpolation).
    n = times_np.shape[0]
    j0 = jnp.clip(jnp.searchsorted(ts, q0, side="right") - 1, 0, n - 2)
    j1 = jnp.clip(jnp.searchsorted(ts, q1, side="right") - 1, 0, n - 2)

    def integral_at(j, t):
        span = ts[j + 1] - ts[j]
        frac = (t - ts[j]) / span
        v_t = v[j] + frac * (v[j + 1] - v[j])
        return cum[j] + 0.5 * (t - ts[j]) * (v[j] + v_t)

    total = integral_at(j1, q1) - integral_at(j0, q0)
    return total / (q1 - q0), valid


def annotate_frames_values(
    series_times_usec,
    series_values,
    frame_times_usec,
    dtype=jnp.float64,
):
    """Per-frame annotation: series averaged over [prev_frame, frame].

    Mirrors the annotate_frames main loop (src/annotate_frames.cc:57-68):
    frame i >= 1 gets the time-averaged series value over the interval from
    frame i-1 to frame i; frames whose interval is not fully covered by the
    series are dropped (reported via the valid mask).

    Returns (values[F-1], valid[F-1]) for frames 1..F-1.
    """
    frame_times = np.asarray(frame_times_usec, dtype=np.int64)
    return time_averaged_values(
        series_values,
        series_times_usec,
        frame_times[:-1],
        frame_times[1:],
        dtype=dtype,
    )
