"""Pallas kernel parity tests (interpret mode on the CPU test backend).

On TPU hardware the compiled fused kernel was verified against the jnp
implementation on random 720p/1080p images and WINS the on-chip race
(tools/bench_fast_pallas.py, chained-execution device timing): 0.17 ms vs
0.37 ms at 720p and 0.42 ms vs 1.64 ms at 1080p for the FAST+NMS pair —
so the Pallas path is the production default on TPU (features._fast_impl).
bench.py re-asserts compiled parity on the real chip every run before
timing it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pilotguru_tpu.vo.fast_pallas import fast_nms_pallas, fast_scores_pallas
from pilotguru_tpu.vo.features import extract_patches, fast_scores, nms3x3
from pilotguru_tpu.vo.patch_pallas import (
    gather_blurred_patches_pallas,
    gather_patches_pallas,
)


class TestFastPallas:
    @pytest.mark.parametrize("shape", [(64, 96), (120, 160), (130, 250)])
    def test_matches_jnp_implementation(self, shape):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, size=shape).astype(np.float32))
        want_raw = np.asarray(fast_scores(img, 20.0 / 255.0))
        want_nms = np.asarray(nms3x3(jnp.asarray(want_raw)))
        raw, nms = fast_nms_pallas(
            img, threshold=20.0 / 255.0, interpret=True
        )
        # fp tolerance: the kernel accumulates the 16 circle taps
        # sequentially, the jnp path reduces a stacked axis — same math,
        # different association order.
        np.testing.assert_allclose(np.asarray(raw), want_raw, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nms), want_nms, atol=1e-5)
        # The NMS support (which pixels survive) must be IDENTICAL — fp
        # noise must never flip a strict-local-max tie.
        assert ((np.asarray(nms) > 0) == (want_nms > 0)).all()

    @pytest.mark.parametrize("block_rows", [8, 24, 64])
    def test_block_size_invariance(self, block_rows):
        """Output must not depend on the row-block partition (halo DMA +
        border masking are exercised differently at each block size)."""
        rng = np.random.default_rng(1)
        img = jnp.asarray(
            rng.uniform(0, 1, size=(100, 140)).astype(np.float32)
        )
        want_raw, want_nms = fast_nms_pallas(img, interpret=True)
        raw, nms = fast_nms_pallas(
            img, block_rows=block_rows, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(raw), np.asarray(want_raw))
        np.testing.assert_array_equal(np.asarray(nms), np.asarray(want_nms))

    def test_structured_corners_detected(self):
        img = np.full((64, 64), 0.2, np.float32)
        img[20:40, 20:40] = 0.9  # a bright square: corners at its vertices
        got = np.asarray(fast_scores_pallas(jnp.asarray(img), interpret=True))
        assert got.sum() > 0
        assert got[:3].sum() == 0 and got[:, :3].sum() == 0  # border zeroed


class TestPatchGatherPallas:
    """Aligned-window DMA + in-tile rotate patch gather (patch_pallas.py).

    On TPU the compiled kernel is raced against the XLA vmap(dynamic_slice)
    gather by tools/bench_fast_pallas.py / bench.py; here interpret mode
    pins exact semantics vs features.extract_patches."""

    @pytest.mark.parametrize("k", [1, 7, 8, 37])
    def test_matches_extract_patches(self, k):
        rng = np.random.default_rng(2)
        img = jnp.asarray(
            rng.uniform(0, 1, size=(120, 160)).astype(np.float32)
        )
        yx = jnp.asarray(
            np.stack(
                [rng.integers(0, 120, k), rng.integers(0, 160, k)], axis=1
            ).astype(np.int32)
        )
        want = np.asarray(extract_patches(img, yx))
        got = np.asarray(gather_patches_pallas(img, yx, 39, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_edge_keypoints(self):
        """Corners/edges exercise the edge padding + window clipping."""
        rng = np.random.default_rng(3)
        img = jnp.asarray(
            rng.uniform(0, 1, size=(64, 96)).astype(np.float32)
        )
        yx = jnp.asarray(
            np.array(
                [[0, 0], [0, 95], [63, 0], [63, 95], [31, 47]], np.int32
            )
        )
        want = np.asarray(extract_patches(img, yx))
        got = np.asarray(gather_patches_pallas(img, yx, 39, interpret=True))
        np.testing.assert_array_equal(got, want)


class TestFusedBlurPatchPallas:
    """Fused gather + separable Gaussian blur (patch_pallas.py): interior
    patches must match blur-then-gather exactly (same taps); border
    patches differ by construction (edge-clamp of the blurred map vs blur
    of the edge-padded raw image — both boundary heuristics) and are only
    checked for shape/finiteness."""

    def test_interior_matches_blur_then_gather(self):
        from pilotguru_tpu.ml.augmentation import gaussian_blur

        rng = np.random.default_rng(4)
        img = jnp.asarray(
            rng.uniform(0, 1, size=(160, 200)).astype(np.float32)
        )
        yx = jnp.asarray(
            np.stack(
                [rng.integers(28, 132, 41), rng.integers(28, 172, 41)],
                axis=1,
            ).astype(np.int32)
        )
        smoothed = gaussian_blur(img[None, :, :, None], 2.0)[0, :, :, 0]
        want = np.asarray(extract_patches(smoothed, yx))
        got = np.asarray(
            gather_blurred_patches_pallas(img, yx, 39, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_border_keypoints_finite(self):
        rng = np.random.default_rng(5)
        img = jnp.asarray(
            rng.uniform(0, 1, size=(64, 96)).astype(np.float32)
        )
        yx = jnp.asarray(
            np.array([[0, 0], [0, 95], [63, 0], [63, 95]], np.int32)
        )
        got = np.asarray(
            gather_blurred_patches_pallas(img, yx, 39, interpret=True)
        )
        assert got.shape == (4, 39, 39)
        assert np.isfinite(got).all()
        assert (got >= 0).all() and (got <= 1).all()
