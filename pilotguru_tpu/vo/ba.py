"""Local bundle adjustment as dense fixed-shape Levenberg-Marquardt.

Replaces Optimizer::LocalBundleAdjustment (the reference's g2o sparse LM,
thirdparty/orb-slam2/src/Optimizer.cc). Local BA windows are small — tens of
keyframes x hundreds of points — so the full dense normal-equation solve
fits the MXU comfortably; sparse Schur machinery buys nothing at this size.

Parameter layout: [K * 6 pose params (world->camera rotvec+t), M * 3 point
coords], all observations flat with (pose_idx, point_idx, uv, valid). Gauge
freedom (monocular: 6 DOF + scale) is pinned by prior residuals anchoring
the first pose and the first-to-second camera-center distance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pilotguru_tpu.solvers.levenberg_marquardt import levenberg_marquardt
from pilotguru_tpu.vo.pose import huber_weights, project, rotvec_to_matrix


class BAProblem(NamedTuple):
    poses6: jnp.ndarray  # [K, 6]
    points: jnp.ndarray  # [M, 3]
    obs_pose: jnp.ndarray  # [O] int32
    obs_point: jnp.ndarray  # [O] int32
    obs_uv: jnp.ndarray  # [O, 2] normalized coordinates
    obs_valid: jnp.ndarray  # [O] bool
    point_valid: jnp.ndarray  # [M] bool
    # Optional [O] inverse noise scale per observation (scale**-level of the
    # observing keypoint) — the reference's per-level invSigma2 information
    # matrix (Optimizer.cc:126-127). None means uniform.
    obs_invsigma: jnp.ndarray = None


class BAResult(NamedTuple):
    poses6: jnp.ndarray
    points: jnp.ndarray
    obs_inliers: jnp.ndarray  # [O] bool
    final_loss: jnp.ndarray


def _camera_center(pose6):
    r = rotvec_to_matrix(pose6[:3])
    return -(r.T @ pose6[3:])


def _residuals(flat, problem: BAProblem, weights, gauge_anchor, anchor_dist):
    k = problem.poses6.shape[0]
    m = problem.points.shape[0]
    poses = flat[: 6 * k].reshape(k, 6)
    points = flat[6 * k :].reshape(m, 3)

    obs_poses = poses[problem.obs_pose]  # [O, 6]
    obs_points = points[problem.obs_point]  # [O, 3]

    def proj_one(pose6, point):
        r = rotvec_to_matrix(pose6[:3])
        cam = r @ point + pose6[3:]
        return project(cam), cam[2]

    uv, z = jax.vmap(proj_one)(obs_poses, obs_points)
    res = uv - problem.obs_uv
    res = jnp.where((z <= 1e-6)[:, None], 1.0, res)
    res = res * weights[:, None]

    # Gauge priors: pin pose 0 entirely; pin the 0->1 camera-center distance
    # (monocular scale).
    pose0_prior = 1e3 * (poses[0] - gauge_anchor)
    c0 = _camera_center(poses[0])
    c1 = _camera_center(poses[jnp.minimum(1, k - 1)])
    scale_prior = 1e2 * (jnp.linalg.norm(c1 - c0) - anchor_dist)
    return jnp.concatenate([res.ravel(), pose0_prior, scale_prior[None]])


def bundle_adjust(
    problem: BAProblem,
    huber_delta: float = 0.006,
    inlier_threshold: float = 0.01,
    irls_rounds: int = 2,
    lm_iters: int = 15,
) -> BAResult:
    """Robust local BA: IRLS Huber reweighting around dense LM."""
    k = problem.poses6.shape[0]
    flat0 = jnp.concatenate([problem.poses6.ravel(), problem.points.ravel()])
    invsigma = (
        problem.obs_invsigma
        if problem.obs_invsigma is not None
        else jnp.ones_like(problem.obs_valid, problem.points.dtype)
    )
    base_w = (
        problem.obs_valid & problem.point_valid[problem.obs_point]
    ).astype(problem.points.dtype) * invsigma
    gauge_anchor = problem.poses6[0]
    c0 = _camera_center(problem.poses6[0])
    c1 = _camera_center(problem.poses6[jnp.minimum(1, k - 1)])
    anchor_dist = jnp.linalg.norm(c1 - c0)

    def current_norms(flat):
        poses = flat[: 6 * k].reshape(k, 6)
        points = flat[6 * k :].reshape(problem.points.shape[0], 3)

        def proj_one(pose6, point):
            r = rotvec_to_matrix(pose6[:3])
            cam = r @ point + pose6[3:]
            return project(cam)

        uv = jax.vmap(proj_one)(
            poses[problem.obs_pose], points[problem.obs_point]
        )
        return jnp.linalg.norm(uv - problem.obs_uv, axis=-1)

    flat = flat0
    loss = jnp.asarray(0.0, flat.dtype)
    for _ in range(irls_rounds):
        # Huber and the inlier gate act on sigma-scaled norms so a coarse
        # (high-level) observation is allowed proportionally more residual.
        w = base_w * huber_weights(current_norms(flat) * invsigma, huber_delta)
        result = levenberg_marquardt(
            lambda f: _residuals(f, problem, w, gauge_anchor, anchor_dist),
            flat,
            num_iters=lm_iters,
        )
        flat, loss = result.x, result.loss

    norms = current_norms(flat) * invsigma
    inliers = (norms < inlier_threshold) & problem.obs_valid
    return BAResult(
        flat[: 6 * k].reshape(k, 6),
        flat[6 * k :].reshape(problem.points.shape[0], 3),
        inliers,
        loss,
    )
