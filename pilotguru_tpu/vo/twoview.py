"""Two-view geometry: batched-RANSAC essential matrix, pose recovery,
triangulation.

Replaces the reference's Initializer (thirdparty/orb-slam2/src/Initializer.cc
H/F model selection + reconstruction). TPU-first shape: RANSAC is a fixed
K-hypothesis vmap — K model fits (tiny SVDs) and one [K, N] scoring matmul —
instead of a data-dependent loop. Calibrated cameras are assumed (the ride
camera is calibrated, src/calibrate.cc), so the essential matrix is fit
directly on normalized coordinates via the 8-point algorithm with the
(1, 1, 0) singular-value projection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TwoViewResult(NamedTuple):
    rotation: jnp.ndarray  # [3, 3] camera1 -> camera2 (R21)
    translation: jnp.ndarray  # [3] unit-norm t21
    points3d: jnp.ndarray  # [N, 3] in camera-1 frame
    inliers: jnp.ndarray  # [N] bool
    score: jnp.ndarray  # [] inlier count of the winning hypothesis


def normalized_coords(xy, fx, fy, cx, cy):
    """Pixel -> normalized camera coordinates."""
    x = (xy[..., 0] - cx) / fx
    y = (xy[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def _essential_from_eight(p1, p2):
    """8-point essential matrix from [8, 2] normalized correspondences."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )  # [8, 9]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[-1].reshape(3, 3)
    # Project onto the essential manifold: singular values (1, 1, 0).
    u, _, vte = jnp.linalg.svd(e)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], e.dtype)) @ vte


def _sampson_error(e, p1, p2):
    """First-order geometric (Sampson) error of x2' E x1 = 0, [N]."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)  # [N, 3]
    x2 = jnp.concatenate([p2, ones], axis=-1)
    ex1 = x1 @ e.T  # = (E x1)^T rows
    etx2 = x2 @ e  # = (E^T x2)^T rows
    num = jnp.sum(x2 * ex1, axis=-1) ** 2
    den = ex1[:, 0] ** 2 + ex1[:, 1] ** 2 + etx2[:, 0] ** 2 + etx2[:, 1] ** 2
    return num / (den + 1e-18)


def triangulate(r21, t21, p1, p2):
    """Midpoint-free DLT triangulation in camera-1 frame.

    P1 = [I | 0], P2 = [R | t]; per-point 4x4 SVD, vmapped. Returns [N, 3].
    """
    p_mat1 = jnp.concatenate([jnp.eye(3, dtype=r21.dtype), jnp.zeros((3, 1), r21.dtype)], axis=1)
    p_mat2 = jnp.concatenate([r21, t21[:, None]], axis=1)

    def one(u1, u2):
        rows = jnp.stack(
            [
                u1[0] * p_mat1[2] - p_mat1[0],
                u1[1] * p_mat1[2] - p_mat1[1],
                u2[0] * p_mat2[2] - p_mat2[0],
                u2[1] * p_mat2[2] - p_mat2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(rows)
        x = vt[-1]
        return x[:3] / (x[3] + 1e-18)

    return jax.vmap(one)(p1, p2)


def _cheirality_count(r21, t21, p1, p2, mask):
    pts = triangulate(r21, t21, p1, p2)
    z1 = pts[:, 2]
    z2 = (pts @ r21.T + t21)[:, 2]
    finite = jnp.all(jnp.isfinite(pts), axis=1)
    good = (z1 > 0) & (z2 > 0) & (jnp.abs(z1) < 1e4) & finite & mask
    return jnp.sum(good), pts, good


def recover_pose(e, p1, p2, mask):
    """Decompose E into the 4 candidate poses, pick by cheirality vote."""
    u, _, vt = jnp.linalg.svd(e)
    # Enforce proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], e.dtype)
    r_a = u @ w @ vt
    r_b = u @ w.T @ vt
    t = u[:, 2]
    candidates = [(r_a, t), (r_a, -t), (r_b, t), (r_b, -t)]
    counts, points, goods = [], [], []
    for r21, t21 in candidates:
        c, pts, good = _cheirality_count(r21, t21, p1, p2, mask)
        counts.append(c)
        points.append(pts)
        goods.append(good)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    return (
        rs[best],
        ts[best],
        jnp.stack(points)[best],
        jnp.stack(goods)[best],
        counts[best],
    )


def two_view_reconstruction(
    p1,
    p2,
    mask,
    rng_key,
    num_hypotheses: int = 128,
    inlier_threshold: float = 2e-5,
) -> TwoViewResult:
    """Batched-RANSAC essential-matrix initialization.

    p1, p2: [N, 2] normalized correspondences (row i of p1 matches row i of
    p2); mask: [N] valid-match flags. ``inlier_threshold`` is a squared
    Sampson error in normalized coordinates (~ (2px / focal)^2).
    """
    n = p1.shape[0]
    weights = mask.astype(jnp.float32) + 1e-6

    def sample(key):
        return jax.random.choice(
            key, n, shape=(8,), replace=False, p=weights / jnp.sum(weights)
        )

    keys = jax.random.split(rng_key, num_hypotheses)
    samples = jax.vmap(sample)(keys)  # [K, 8]

    def fit_and_score(idx):
        e = _essential_from_eight(p1[idx], p2[idx])
        err = _sampson_error(e, p1, p2)
        inl = (err < inlier_threshold) & mask
        return e, jnp.sum(inl)

    es, scores = jax.vmap(fit_and_score)(samples)
    best = jnp.argmax(scores)
    e = es[best]
    err = _sampson_error(e, p1, p2)
    inliers = (err < inlier_threshold) & mask

    # Refit on all inliers (least squares over the full inlier set) for a
    # polished model, then recover the pose.
    x1 = jnp.concatenate([p1, jnp.ones((n, 1), p1.dtype)], axis=1)
    x2 = jnp.concatenate([p2, jnp.ones((n, 1), p2.dtype)], axis=1)
    a = jnp.einsum("ni,nj->nij", x2, x1).reshape(n, 9)
    a = a * inliers[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    e_ref = vt[-1].reshape(3, 3)
    u, _, vte = jnp.linalg.svd(e_ref)
    e_ref = u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], e.dtype)) @ vte
    err_ref = _sampson_error(e_ref, p1, p2)
    inliers_ref = (err_ref < inlier_threshold) & mask
    use_refit = jnp.sum(inliers_ref) >= jnp.sum(inliers)
    e_final = jnp.where(use_refit, e_ref, e)
    inliers = jnp.where(use_refit, inliers_ref, inliers)

    r21, t21, pts, good, _ = recover_pose(e_final, p1, p2, inliers)
    return TwoViewResult(r21, t21, pts, good & inliers, jnp.sum(good & inliers))
