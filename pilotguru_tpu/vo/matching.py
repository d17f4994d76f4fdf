"""Brute-force binary descriptor matching on the MXU.

Replaces both ORBmatcher's windowed Hamming searches and the DBoW2
bag-of-words index (/root/reference/thirdparty/orb-slam2/src/ORBmatcher.cc,
thirdparty/DBoW2): at a 2000-feature budget, an exhaustive 2000 x 2000
Hamming table is a single 256-deep int8 matmul — exactly the systolic
array's shape — so approximate vocabulary indexing buys nothing on TPU.

Hamming distance via the +-1 trick: with bits mapped to {-1, +1},
dot(a, b) = 256 - 2 * hamming(a, b), so hamming = (256 - dot) / 2 with the
dot computed as an int8 MXU matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pilotguru_tpu.vo.features import DESCRIPTOR_BITS

# ORBmatcher thresholds (ORBmatcher.cc TH_LOW / TH_HIGH).
HAMMING_LOW = 50
HAMMING_HIGH = 100


class Matches(NamedTuple):
    index: jnp.ndarray  # [Na] int32 — best match in B per A row (or -1)
    distance: jnp.ndarray  # [Na] int32
    valid: jnp.ndarray  # [Na] bool


def hamming_table(desc_a, desc_b, valid_a=None, valid_b=None):
    """Pairwise Hamming distances [Na, Nb] (invalid rows/cols -> 257)."""
    a = (desc_a.astype(jnp.int8) * 2 - 1).astype(jnp.int8)
    b = (desc_b.astype(jnp.int8) * 2 - 1).astype(jnp.int8)
    dot = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dist = (DESCRIPTOR_BITS - dot) // 2
    big = DESCRIPTOR_BITS + 1
    if valid_a is not None:
        dist = jnp.where(valid_a[:, None], dist, big)
    if valid_b is not None:
        dist = jnp.where(valid_b[None, :], dist, big)
    return dist


def match_descriptors(
    desc_a,
    desc_b,
    valid_a=None,
    valid_b=None,
    max_distance: int = HAMMING_LOW,
    ratio: float = 0.9,
    mutual: bool = True,
) -> Matches:
    """Best-match search with Lowe ratio + optional mutual-best check.

    Mirrors ORBmatcher's nearest/second-nearest ratio test
    (ORBmatcher.cc SearchByBoW / SearchForInitialization semantics).
    """
    dist = hamming_table(desc_a, desc_b, valid_a, valid_b)  # [Na, Nb]
    best_idx = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    # Second best: mask out the best column per row.
    masked = dist.at[jnp.arange(dist.shape[0]), best_idx].set(
        DESCRIPTOR_BITS + 1
    )
    second = jnp.min(masked, axis=1)

    ok = (best <= max_distance) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    if mutual:
        best_rev = jnp.argmin(dist, axis=0)  # [Nb]
        ok = ok & (best_rev[best_idx] == jnp.arange(dist.shape[0]))
    if valid_a is not None:
        ok = ok & valid_a
    return Matches(
        index=jnp.where(ok, best_idx, -1).astype(jnp.int32),
        distance=best.astype(jnp.int32),
        valid=ok,
    )


def match_projected(
    desc_a,
    xy_a,
    desc_b,
    xy_b,
    search_radius: float,
    valid_a=None,
    valid_b=None,
    max_distance: int = HAMMING_HIGH,
    ratio: float = 0.9,
) -> Matches:
    """Window-constrained matching: candidates must lie within
    ``search_radius`` pixels (ORBmatcher::SearchByProjection semantics, as a
    masked dense table instead of per-cell candidate lists)."""
    dist = hamming_table(desc_a, desc_b, valid_a, valid_b)
    # d^2 via the ||a||^2 + ||b||^2 - 2ab expansion: one extra MXU matmul
    # instead of materializing a rank-3 [Na, Nb, 2] difference tensor.
    a2 = jnp.sum(xy_a * xy_a, axis=-1)
    b2 = jnp.sum(xy_b * xy_b, axis=-1)
    d2 = a2[:, None] + b2[None, :] - 2.0 * (xy_a @ xy_b.T)
    dist = jnp.where(d2 <= search_radius**2, dist, DESCRIPTOR_BITS + 1)
    best_idx = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    masked = dist.at[jnp.arange(dist.shape[0]), best_idx].set(
        DESCRIPTOR_BITS + 1
    )
    second = jnp.min(masked, axis=1)
    ok = (best <= max_distance) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    if valid_a is not None:
        ok = ok & valid_a
    return Matches(
        index=jnp.where(ok, best_idx, -1).astype(jnp.int32),
        distance=best.astype(jnp.int32),
        valid=ok,
    )
