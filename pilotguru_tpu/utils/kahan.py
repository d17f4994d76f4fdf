"""Kahan compensated summation.

The reference accumulates the forward-axis velocity sum with a KahanSum
(include/math/math.hpp:8-25, used at fit_motion.cc:171-242) because it adds
hundreds of thousands of float64 terms sequentially. In this framework the
equivalent reduction runs as a device segment-sum (tree-shaped, so error
grows O(log n) rather than O(n)), which is why the pipeline does not need
compensation; this utility exists for host-side accumulation loops where
sequential adds do occur (e.g. streaming consumers of recorder data).
"""

from __future__ import annotations

import numpy as np


class KahanSum:
    """Compensated accumulator for scalars or numpy arrays."""

    def __init__(self, zero=0.0):
        self._sum = np.asarray(zero, dtype=np.float64).copy()
        self._compensation = np.zeros_like(self._sum)

    def add(self, value) -> "KahanSum":
        y = np.asarray(value, dtype=np.float64) - self._compensation
        t = self._sum + y
        self._compensation = (t - self._sum) - y
        self._sum = t
        return self

    @property
    def sum(self):
        return self._sum.copy()


def kahan_sum(values, axis=0):
    """Compensated reduction of an array along an axis (numpy, float64)."""
    values = np.asarray(values, np.float64)
    acc = KahanSum(np.zeros(np.delete(values.shape, axis)))
    for i in range(values.shape[axis]):
        acc.add(np.take(values, i, axis=axis))
    return acc.sum
