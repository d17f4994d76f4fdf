"""Gaussian-CDF time-series smoothing as a banded vectorized device op.

The reference smooths a piecewise-constant time series by integrating it
against a Gaussian centred at each target timestamp, walking a +-3 sigma
window with two persistent pointers (SmoothTimeSeries,
/root/reference/src/slam/smoothing.cc:56-98 and the templated variant in
include/interpolation/time_series.hpp:17-64). Equivalent closed form used
here: with band [left_t, right_t] around target t,

  out[t] = sum_{j=left}^{right-1} v[j] * (Phi(mid_{j,j+1}; t) - Phi(mid_{j-1,j}; t))
           + v[right] * (1 - Phi(mid_{right-1,right}; t))

where Phi is the normal CDF and mid is the midpoint between consecutive
sample timestamps. The band bounds are computed on host with searchsorted
(identical to the pointer walk for sorted targets); the weighted gather-sum
runs as one fused array program of shape [T, B] with B = max band width.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf


def _band_bounds(timestamps: np.ndarray, targets: np.ndarray, sigma: float):
    """Per-target inclusive band [left, right] exactly as the pointer walk."""
    n = timestamps.shape[0]
    left = np.searchsorted(timestamps, targets - 3.0 * sigma, side="left") - 1
    left = np.clip(left, 0, n - 1)
    right = np.searchsorted(timestamps, targets + 3.0 * sigma, side="left")
    right = np.clip(right, 0, n - 1)
    return left.astype(np.int64), right.astype(np.int64)


def smooth_time_series(
    values,
    timestamps,
    target_timestamps,
    sigma: float,
    dtype=jnp.float64,
    sample_bucket: int | None = None,
    target_bucket: int | None = None,
):
    """Gaussian smoothing of a (possibly vector-valued) time series.

    Args:
      values: [N] or [N, D] sample values.
      timestamps: [N] sorted sample times (same units as sigma).
      target_timestamps: [T] sorted query times.
      sigma: Gaussian width, in time units.
      sample_bucket / target_bucket: optional shape-bucket granularities so
        series of similar length reuse one compiled program (corpus path).
        Padding is exactly neutral: band bounds come from the REAL arrays,
        out-of-band gather positions carry weight exactly 0, and padded
        target rows are sliced away.

    Returns [T] (or [T, D]) smoothed values, matching the reference
    SmoothTimeSeries semantics.
    """
    if sigma <= 0:
        raise ValueError("sigma must be positive")
    values_np = np.asarray(values)
    ts_np = np.asarray(timestamps, dtype=np.float64)
    targets_np = np.asarray(target_timestamps, dtype=np.float64)
    if ts_np.shape[0] != values_np.shape[0]:
        raise ValueError("timestamps/values length mismatch")

    left, right = _band_bounds(ts_np, targets_np, float(sigma))
    band = int(np.max(right - left)) + 1 if targets_np.size else 1

    squeeze = values_np.ndim == 1
    vals2d = values_np.reshape(values_np.shape[0], -1)

    num_targets = targets_np.shape[0]
    if sample_bucket or target_bucket:
        band = -(-band // 4) * 4  # a band bucket of its own

        def round_up(n, multiple):
            return max(-(-n // multiple) * multiple, multiple)

        if sample_bucket:
            n_pad = round_up(ts_np.shape[0], sample_bucket) - ts_np.shape[0]
            ts_np = np.concatenate([ts_np, np.zeros(n_pad)])
            vals2d = np.concatenate(
                [vals2d, np.zeros((n_pad, vals2d.shape[1]), vals2d.dtype)]
            )
        if target_bucket and num_targets:
            t_pad = round_up(num_targets, target_bucket) - num_targets
            targets_np = np.concatenate(
                [targets_np, np.full(t_pad, targets_np[-1])]
            )
            left = np.concatenate([left, np.full(t_pad, left[-1])])
            right = np.concatenate([right, np.full(t_pad, right[-1])])

    out = _smooth_banded(
        jnp.asarray(vals2d, dtype=dtype),
        jnp.asarray(ts_np, dtype=dtype),
        jnp.asarray(targets_np, dtype=dtype),
        jnp.asarray(left),
        jnp.asarray(right),
        band,
        float(sigma),
    )
    out = out[:num_targets]
    return out[:, 0] if squeeze else out


@partial(jax.jit, static_argnames=("band", "sigma"))
def _smooth_banded(vals, ts, targets, left, right, band, sigma):
    n = ts.shape[0]
    j = jnp.arange(band)  # [B]
    idx = jnp.clip(left[:, None] + j[None, :], 0, n - 1)  # [T, B]
    m = (right - left)[:, None]  # number of intervals in each band

    g_ts = ts[idx]  # [T, B]
    g_vals = vals[idx]  # [T, B, D]

    # Midpoints between consecutive in-band samples; CDF at each midpoint.
    mid = 0.5 * (g_ts[:, :-1] + g_ts[:, 1:])  # [T, B-1]
    z = (mid - targets[:, None]) / (jnp.sqrt(jnp.asarray(2.0, vals.dtype)) * sigma)
    cdf = 0.5 * (1.0 + erf(z))  # [T, B-1]
    # Midpoint CDFs apply to the m real intervals (j < m); positions at/after
    # the band's right edge take CDF = 1 so that the remaining tail mass lands
    # on the right-edge sample and out-of-band weights vanish (including the
    # degenerate m == 0 band, where all mass goes to the single sample).
    in_band = j[None, :-1] < m if band > 1 else jnp.zeros((1, 0), bool)
    cdf = jnp.where(in_band, cdf, 1.0)
    cdf_full = jnp.concatenate(
        [jnp.zeros((cdf.shape[0], 1), vals.dtype), cdf,
         jnp.ones((cdf.shape[0], 1), vals.dtype)],
        axis=1,
    )  # [T, B+1]
    weights = cdf_full[:, 1:] - cdf_full[:, :-1]  # [T, B]
    return jnp.einsum("tb,tbd->td", weights, g_vals)


def smooth_quaternion_sequence(quats, sigma: int, dtype=jnp.float64):
    """Per-component Gaussian filtering of a quaternion sequence + renorm.

    Matches SmoothHeadingDirections (/root/reference/src/slam/smoothing.cc:8-46):
    a discrete Gaussian kernel of size 4*sigma+1 (OpenCV getGaussianKernel)
    applied per component with replicate border handling, then per-element
    renormalization. sigma is in units of samples.
    """
    if sigma <= 0:
        raise ValueError("sigma must be positive")
    q = jnp.asarray(quats, dtype=dtype)  # [N, 4]
    ksize = 4 * int(sigma) + 1
    half = ksize // 2
    # OpenCV getGaussianKernel for ksize > 7 uses the true Gaussian with
    # sigma as given, normalized to sum 1 (for small fixed sizes it has
    # hardcoded tables only when sigma <= 0, which never happens here).
    x = np.arange(ksize, dtype=np.float64) - half
    kernel = np.exp(-(x**2) / (2.0 * float(sigma) ** 2))
    kernel = jnp.asarray(kernel / kernel.sum(), dtype=dtype)

    padded = jnp.concatenate(
        [jnp.repeat(q[:1], half, axis=0), q, jnp.repeat(q[-1:], half, axis=0)],
        axis=0,
    )
    smoothed = jax.vmap(
        lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1
    )(padded)
    norm = jnp.linalg.norm(smoothed, axis=1, keepdims=True)
    return smoothed / norm
