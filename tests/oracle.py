"""Literal-semantics oracles for numeric parity tests.

These are deliberately naive sequential re-derivations of the reference
algorithms' documented semantics (cited per function), used as ground truth
for the vectorized TPU implementations. They mirror *behavior*, not code.
"""

from __future__ import annotations

import math

import numpy as np


def merge_time_series(components):
    """Pointer-walk merge. Semantics of MergeTimeSeries
    (/root/reference/src/interpolation/align_time_series.cc:29-113)."""
    comps = [list(map(int, c)) for c in components]
    start_time = max(c[0] for c in comps)
    end_time = min(c[-1] for c in comps)
    if end_time < start_time:
        return [], []

    current = []
    for c in comps:
        i = 0
        while c[i] < start_time:
            i += 1
        if c[i] > start_time:
            current.append(i - 1)
        else:
            current.append(i)

    events, times = [], []
    while True:
        events.append(list(current))
        times.append(max(comps[k][current[k]] for k in range(len(comps))))
        next_times = []
        for k in range(len(comps)):
            ni = current[k] + 1
            if ni >= len(comps[k]):
                return times, events
            next_times.append(comps[k][ni])
        nt = min(next_times)
        for k in range(len(comps)):
            if comps[k][current[k] + 1] == nt:
                current[k] += 1


def make_interpolation_intervals(reference_ts, interpolation_ts):
    """Nested-interval construction. Semantics of MakeInterpolationIntervals
    (/root/reference/src/interpolation/align_time_series.cc:155-196).
    Returns list (per reference idx) of tuples (ref_end, itp_end, start, end).
    """
    ref = list(map(int, reference_ts))
    itp = list(map(int, interpolation_ts))
    result = []
    latest = min(itp[0], ref[0])
    i = 0
    for r, rts in enumerate(ref):
        intervals = []
        while i < len(itp) and itp[i] <= rts:
            its = itp[i]
            if its > latest and i > 0 and r > 0:
                intervals.append((r, i, latest, its))
            latest = its
            i += 1
        if i > 0 and r > 0 and i < len(itp) and rts > latest:
            intervals.append((r, i, latest, rts))
        latest = rts
        result.append(intervals)
    return result


def smooth_time_series(values, timestamps, targets, sigma):
    """Pointer-walk Gaussian-CDF smoothing. Semantics of SmoothTimeSeries
    (/root/reference/src/slam/smoothing.cc:56-98)."""
    values = np.asarray(values, dtype=np.float64)
    ts = list(map(float, timestamps))
    out = np.zeros((len(targets),) + values.shape[1:], dtype=np.float64)
    left = 0
    right = 0
    for t_idx, target in enumerate(targets):
        while left + 1 < len(values) and (target - ts[left + 1]) > 3 * sigma:
            left += 1
        while right + 1 < len(values) and (ts[right] - target) < 3 * sigma:
            right += 1
        prev_cdf = 0.0
        for j in range(left, right):
            mid = (ts[j] + ts[j + 1]) / 2.0
            cdf = 0.5 * (1.0 + math.erf((mid - target) / (math.sqrt(2.0) * sigma)))
            out[t_idx] += values[j] * (cdf - prev_cdf)
            prev_cdf = cdf
        out[t_idx] += values[right] * (1.0 - prev_cdf)
    return out


def time_averaged_value(values, times_usec, start_usec, end_usec):
    """Trapezoid interval average. Semantics of TimeSeries::TimeAveragedValue
    (/root/reference/include/interpolation/time_series.hpp:134-189).
    Returns (value, is_valid)."""
    values = list(map(float, values))
    times = list(map(int, times_usec))
    if start_usec < times[0] or end_usec > times[-1]:
        return float("nan"), False

    def most_recent(t):
        i = 0
        while i < len(times) and times[i] <= t:
            i += 1
        return i - 1

    def sec(a, b):
        return (b - a) * 1e-6

    def lerp(li, ri, t):
        lt = sec(times[li], t)
        rt = sec(t, times[ri])
        tot = sec(times[li], times[ri])
        return (lt / tot) * values[ri] + (rt / tot) * values[li]

    si = most_recent(start_usec)
    ei = most_recent(end_usec)
    total = 0.0
    for j in range(si + 1, ei):
        total += sec(times[j], times[j + 1]) * 0.5 * (values[j] + values[j + 1])
    lv = lerp(si, si + 1, start_usec)
    rv = lerp(ei, ei + 1, end_usec)
    if si == ei:
        total += (lv + rv) * 0.5 * sec(start_usec, end_usec)
    else:
        total += (lv + values[si + 1]) * 0.5 * sec(start_usec, times[si + 1])
        total += (values[ei] + rv) * 0.5 * sec(times[ei], end_usec)
    return total / sec(start_usec, end_usec), True


def rotation_rate_to_quat(rate, duration_sec):
    """Exponential map. Semantics of RotationMotionToQuaternion
    (/root/reference/src/geometry/geometry.cc:6-22)."""
    rx, ry, rz = map(float, rate)
    omega = math.sqrt(rx * rx + ry * ry + rz * rz)
    half = omega * duration_sec * 0.5
    s = math.sin(half) / (omega + 1e-30)
    return np.array([math.cos(half), rx * s, ry * s, rz * s])


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_rotate(q, v):
    w = q[0]
    u = np.asarray(q[1:])
    v = np.asarray(v, dtype=np.float64)
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def integrate_motion_sequence(
    rates, accs, durations_sec, global_bias, local_bias, v0, q0=None
):
    """Sequential strapdown chain. Semantics of IntegrateMotion applied in a
    loop (/root/reference/src/geometry/geometry.cc:24-53, driven at
    velocity.cc:95-102). Returns (orientations [T,4], velocities [T,3])."""
    q = np.array([1.0, 0, 0, 0]) if q0 is None else np.asarray(q0, np.float64)
    v = np.asarray(v0, dtype=np.float64).copy()
    qs, vs = [], []
    for rate, acc, dt in zip(rates, accs, durations_sec):
        a_cal = np.asarray(acc, np.float64) + np.asarray(local_bias, np.float64)
        a_glob = quat_rotate(q, a_cal) + np.asarray(global_bias, np.float64)
        v = v + a_glob * dt
        q = quat_mul(q, rotation_rate_to_quat(rate, dt))
        qs.append(q.copy())
        vs.append(v.copy())
    return np.array(qs), np.array(vs)
