"""Local bundle adjustment: Schur-complement Levenberg-Marquardt.

Replaces Optimizer::LocalBundleAdjustment (the reference's g2o sparse LM,
thirdparty/orb-slam2/src/Optimizer.cc). The default solver exploits the
bipartite BA structure the way g2o's BlockSolver does, but with fixed TPU
shapes: per-observation 2x9 Jacobians (vmapped forward-mode), segment-summed
into per-pose 6x6 / per-point 3x3 normal-equation blocks plus the pose-point
coupling W, batched closed-form 3x3 point-block inverses, and one dense
6K x 6K reduced-camera solve per iteration. At local-BA scale (K ~ 6 poses,
M ~ 1-2k points, O ~ 2k observations) this is ~1000x fewer FLOPs per
iteration than flattening to a dense (6K + 3M)-parameter system: the dense
path's jacfwd sweep + LU on a ~3.9k-square matrix measured 816 ms/call on a
v5e-class chip; the Schur path retires the same 30 LM iterations in a few
milliseconds.

A dense fallback (``solver="dense"``) retains the flattened
levenberg_marquardt formulation as a cross-check oracle for tests.

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
from pilotguru_tpu.vo.pose import (
    huber_weights,
    inv3x3,
    project,
    rotvec_to_matrix,
)


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


_inv3x3 = inv3x3  # shared closed-form batched inverse (pose.inv3x3)


def _schur_lm(
    problem: BAProblem,
    weights,
    gauge_anchor,
    anchor_dist,
    num_iters: int,
    init_damping: float = 1e-3,
    damping_down: float = 1.0 / 3.0,
    min_damping: float = 1e-12,
    max_damping: float = 1e12,
    grad_tol: float = 1e-10,
    diag_regularization: float = 1e-12,
    ftol: float = 1e-7,
):
    """One IRLS round of BA as Schur-complement LM (weights held fixed).

    Returns (poses6 [K, 6], points [M, 3], loss []). Same Nielsen gain-ratio
    damping schedule as solvers.levenberg_marquardt; the normal equations are
    never materialized at full (6K + 3M) size — the point block is solved in
    closed form and only the 6K x 6K reduced camera system is factorized.

    Runs as a device-side ``while_loop`` capped at ``num_iters`` but exiting
    as soon as the gradient is tiny or an accepted step improves the loss by
    less than ``ftol`` relative — per-keyframe local BA starts from the
    already-refined map (the previous window's solution), so steady-state
    windows converge in a handful of iterations and the early exit converts
    that into real device time (g2o's LM has the same stop rule).
    """
    k = problem.poses6.shape[0]
    m = problem.points.shape[0]
    dtype = problem.points.dtype
    obs_p = problem.obs_pose
    obs_l = problem.obs_point
    eye_p = jnp.eye(6 * k, dtype=dtype)

    def res_jac(poses, points):
        """Weighted residuals [O, 2] + Jacobian blocks A [O, 2, 6], B [O, 2, 3]."""

        def one(o_p, o_l, uv, w):
            def f(pl):
                pose6, pt = pl[:6], pl[6:]
                r = rotvec_to_matrix(pose6[:3])
                cam = r @ pt + pose6[3:]
                res = project(cam) - uv
                # Behind-camera observations: constant penalty, zero slope
                # (matches the dense formulation's where() semantics).
                res = jnp.where(cam[2] <= 1e-6, jnp.ones(2, dtype), res)
                return res * w

            pl = jnp.concatenate([poses[o_p], points[o_l]])
            jac = jax.jacfwd(f)(pl)  # [2, 9]
            return f(pl), jac[:, :6], jac[:, 6:]

        return jax.vmap(one)(obs_p, obs_l, problem.obs_uv, weights)

    def prior_res(poses_flat):
        poses = poses_flat.reshape(k, 6)
        pose0_prior = 1e3 * (poses[0] - gauge_anchor)
        c0 = _camera_center(poses[0])
        c1 = _camera_center(poses[jnp.minimum(1, k - 1)])
        scale_prior = 1e2 * (jnp.linalg.norm(c1 - c0) - anchor_dist)
        return jnp.concatenate([pose0_prior, scale_prior[None]])

    def loss_of(poses, points):
        res, _, _ = res_jac(poses, points)
        pr = prior_res(poses.ravel())
        return jnp.sum(res * res) + jnp.sum(pr * pr)

    def step(state):
        poses, points, damping, nu, loss, iters, done = state
        res, a_blk, b_blk = res_jac(poses, points)

        # Normal-equation blocks via segment sums over observations.
        h_pp = jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", a_blk, a_blk), obs_p, num_segments=k
        )  # [K, 6, 6]
        g_p = jax.ops.segment_sum(
            jnp.einsum("oia,oi->oa", a_blk, res), obs_p, num_segments=k
        )  # [K, 6]
        h_ll = jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", b_blk, b_blk), obs_l, num_segments=m
        )  # [M, 3, 3]
        g_l = jax.ops.segment_sum(
            jnp.einsum("oia,oi->oa", b_blk, res), obs_l, num_segments=m
        )  # [M, 3]
        w_pl = jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", a_blk, b_blk),
            obs_l * k + obs_p,
            num_segments=m * k,
        ).reshape(m, k, 6, 3)

        # Gauge priors act on poses only; their Jacobian is tiny (7 x 6K).
        pr = prior_res(poses.ravel())
        j_pr = jax.jacfwd(prior_res)(poses.ravel())  # [7, 6K]
        p_full = jax.scipy.linalg.block_diag(*h_pp) + j_pr.T @ j_pr
        g_pose = g_p.ravel() + j_pr.T @ pr  # [6K]

        # Marquardt scaling diagonals (match the dense solver's regularized
        # diagonal damping).
        diag_p = jnp.diagonal(p_full) + diag_regularization
        diag_l = (
            jnp.diagonal(h_ll, axis1=-2, axis2=-1) + diag_regularization
        )  # [M, 3]

        p_damped = (
            p_full
            + damping * jnp.diagflat(diag_p)
            + diag_regularization * eye_p
        )
        h_ll_damped = h_ll + (
            damping * diag_l + diag_regularization
        )[..., None] * jnp.eye(3, dtype=dtype)
        h_ll_inv = _inv3x3(h_ll_damped)  # [M, 3, 3]

        # Reduced camera system: S = P - W Hll^-1 W^T, rhs = -gp + W Hll^-1 gl.
        w_hinv = jnp.einsum("mkia,mab->mkib", w_pl, h_ll_inv)  # [M, K, 6, 3]
        s = p_damped - jnp.einsum("mkib,mljb->kilj", w_hinv, w_pl).reshape(
            6 * k, 6 * k
        )
        rhs = -g_pose + jnp.einsum("mkib,mb->ki", w_hinv, g_l).ravel()
        dx_p = jnp.linalg.solve(s, rhs)  # [6K]
        dx_l = -jnp.einsum(
            "mab,mb->ma",
            h_ll_inv,
            g_l + jnp.einsum("mkia,ki->ma", w_pl, dx_p.reshape(k, 6)),
        )  # [M, 3]

        poses_try = poses + dx_p.reshape(k, 6)
        points_try = points + dx_l
        loss_try = loss_of(poses_try, points_try)

        # Nielsen gain-ratio damping, identical schedule to the dense LM.
        predicted = (
            jnp.dot(dx_p, damping * (diag_p * dx_p) - g_pose)
            + jnp.sum(dx_l * (damping * (diag_l * dx_l) - g_l))
        )
        rho = (loss - loss_try) / jnp.maximum(predicted, 1e-300)
        accept = (loss_try < loss) & (predicted > 0)

        grad_small = (
            jnp.maximum(
                jnp.max(jnp.abs(2.0 * g_pose)), jnp.max(jnp.abs(2.0 * g_l))
            )
            < grad_tol
        )
        # Converged when an accepted step improves the loss by less than
        # ftol relative, OR when the quadratic model itself cannot promise
        # an ftol-sized reduction (predicted decrease below ftol * loss) —
        # at that point further damping retries cannot help either.
        converged = accept & (loss - loss_try < ftol * loss)
        stalled = predicted < ftol * loss
        done_next = done | grad_small | converged | stalled

        keep = ~accept
        poses_next = jnp.where(keep, poses, poses_try)
        points_next = jnp.where(keep, points, points_try)
        loss_next = jnp.where(keep, loss, loss_try)
        shrink = jnp.maximum(
            jnp.asarray(damping_down, dtype), 1.0 - (2.0 * rho - 1.0) ** 3
        )
        damping_next = jnp.where(accept, damping * shrink, damping * nu)
        nu_next = jnp.where(accept, jnp.asarray(2.0, dtype), nu * 2.0)
        damping_next = jnp.clip(damping_next, min_damping, max_damping)
        return (
            poses_next,
            points_next,
            damping_next,
            nu_next,
            loss_next,
            iters + 1,
            done_next,
        )

    init = (
        problem.poses6,
        problem.points,
        jnp.asarray(init_damping, dtype),
        jnp.asarray(3.0, dtype),
        loss_of(problem.poses6, problem.points),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    poses, points, _, _, loss, iters, _ = jax.lax.while_loop(
        lambda s: (~s[6]) & (s[5] < num_iters), step, init
    )
    return poses, points, loss, iters


def bundle_adjust(
    problem: BAProblem,
    huber_delta: float = 0.006,
    inlier_threshold: float = 0.01,
    irls_rounds: int = 2,
    lm_iters=(5, 10),
    solver: str = "schur",
) -> BAResult:
    """Robust local BA: IRLS Huber reweighting around dense LM.

    ``lm_iters``: LM iteration cap per IRLS round — either one int for every
    round or a per-round tuple. The default (5, 10) mirrors the reference's
    LocalBundleAdjustment budget exactly (Optimizer.cc:660,707: optimize(5),
    outlier reweight, optimize(10)); the IRLS Huber reweight between rounds
    plays the role of g2o's outlier check."""
    if isinstance(lm_iters, int):
        iters_schedule = (lm_iters,) * irls_rounds
    else:
        iters_schedule = tuple(lm_iters)
        irls_rounds = len(iters_schedule)
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
    for round_iters in iters_schedule:
        # Huber and the inlier gate act on sigma-scaled norms so a coarse
        # (high-level) observation is allowed proportionally more residual.
        w = base_w * huber_weights(current_norms(flat) * invsigma, huber_delta)
        if solver == "schur":
            poses_r, points_r, loss, _ = _schur_lm(
                problem._replace(
                    poses6=flat[: 6 * k].reshape(k, 6),
                    points=flat[6 * k :].reshape(problem.points.shape[0], 3),
                ),
                w,
                gauge_anchor,
                anchor_dist,
                num_iters=round_iters,
            )
            flat = jnp.concatenate([poses_r.ravel(), points_r.ravel()])
        else:
            result = levenberg_marquardt(
                lambda f: _residuals(f, problem, w, gauge_anchor, anchor_dist),
                flat,
                num_iters=round_iters,
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
