"""Per-stage device timing of the ORB extractor at the reference budget.

Times each PRODUCTION stage of extract_orb_features (FAST response, NMS,
grid top-k, subpixel, patch gather, orientation moments, BRIEF matmul,
blur, resize) separately on the attached chip. Uses a two-chain-length
differencing timer so the remote tunnel's fixed ~28 ms round-trip cancels
exactly (a scalar-body chain otherwise times at 0.87 ms/iter of pure RTT).
Drives what to optimize next: the extract_ms term bounds the VO device-fps
headline metric.

Run from /root/repo:  python tools/profile_extract.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pilotguru_tpu.vo import features as F  # noqa: E402


def device_ms(body, args, iters=128):
    def chain(n):
        @jax.jit
        def chained(*xs):
            def it(i, carry):
                return body(*xs, carry) * 1e-20

            return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

        float(np.asarray(chained(*args)))  # compile + warm
        best = np.inf
        for _ in range(3):
            start = time.perf_counter()
            float(np.asarray(chained(*args)))
            best = min(best, time.perf_counter() - start)
        return best

    half = max(iters // 2, 1)
    return max(chain(2 * half) - chain(half), 0.0) / half * 1e3


def main():
    h, w = 720, 1280
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
    thr = 20.0 / 255.0
    scale, levels, budget = 1.2, 8, 2000
    budgets = F.pyramid_level_budgets(budget, levels, scale)

    rows = []

    def stage(name, body, args, iters=32):
        ms = device_ms(body, args, iters)
        rows.append((name, ms))
        print(f"{name:28s} {ms:8.3f} ms", flush=True)

    # --- L0-only stages (dominant level), production path ---
    stage("fast_scores L0", lambda x, c: F.fast_scores(x + c, thr).sum(), (img,))
    raw = F.fast_scores(img, thr)
    stage("nms3x3 L0", lambda s, c: F.nms3x3(s + c).sum(), (raw,))
    scores = F.nms3x3(raw)
    stage(
        "grid_topk L0",
        lambda s, c: F.select_grid_topk(s + c, budgets[0])[1].sum(),
        (scores,),
    )
    yx, _, _ = F.select_grid_topk(scores, budgets[0])
    stage(
        "subpixel L0",
        lambda s, c: F.subpixel_offsets(s + c, yx).sum(),
        (raw,),
    )
    from pilotguru_tpu.ml.augmentation import gaussian_blur

    stage(
        "gaussian_blur L0",
        lambda x, c: gaussian_blur((x + c)[None, :, :, None], 2.0).sum(),
        (img,),
    )
    smoothed = gaussian_blur(img[None, :, :, None], 2.0)[0, :, :, 0]
    stage(
        "patch_gather L0",
        lambda x, c: F.extract_patches(x + c, yx).sum(),
        (smoothed,),
    )
    patches = F.extract_patches(smoothed, yx)
    stage(
        "orient_moments L0",
        lambda p, c: F.orientations_from_patches(p + c).sum(),
        (patches,),
    )
    angle = F.orientations_from_patches(patches)
    stage(
        "brief_matmul L0",
        lambda p, c: F.brief_from_patches(p + c, angle)
        .astype(jnp.float32)
        .sum(),
        (patches,),
    )
    stage(
        "resize->L1",
        lambda x, c: jax.image.resize(
            x + c, (600, 1067), method="linear"
        ).sum(),
        (img,),
    )

    # --- full extract, single frame and batch-8 ---
    stage(
        "extract full (1 frame)",
        lambda x, c: F.extract_orb_features(
            x + c, num_levels=levels, total_budget=budget
        ).xy.sum(),
        (img,),
        iters=16,
    )
    batch = jnp.asarray(rng.uniform(size=(8, h, w)).astype(np.float32))
    stage(
        "extract full (batch 8)",
        lambda x, c: F.extract_orb_features_batch(
            x + c, num_levels=levels, total_budget=budget
        ).xy.sum(),
        (batch,),
        iters=8,
    )

    total_l0 = sum(ms for name, ms in rows if name.endswith("L0"))
    print(f"\nL0 stages sum: {total_l0:.3f} ms (pyramid sum ~ x3.2 of L0-like work)")


if __name__ == "__main__":
    main()
