"""Race BRIEF/orientation implementations on the chip.

The extractor profile (tools/profile_extract.py) shows the per-keypoint
scattered gathers of brief_descriptors (512 random pixel reads per kp) and
orientations (31x31 dynamic-slice + masked sums per kp) dominating extract
time. Candidate restructure: ONE patch extraction per keypoint (vmapped
dynamic_slice -> [K, S, S]) feeding
  - orientation as a static masked-moment contraction (einsum, MXU/VPU), and
  - BRIEF as an in-patch take_along_axis on [K, S*S] rows,
so the only data-dependent addressing left is the block-structured patch
fetch. This script times each variant; parity is asserted against the
shipped implementations.

Run from /root/repo:  python tools/bench_brief_variants.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pilotguru_tpu.vo import features as F  # noqa: E402

PATCH_R = 19  # covers orientation (r=15) and rotated BRIEF taps (<= 19)
S = 2 * PATCH_R + 1


def extract_patches(image, yx):
    padded = jnp.pad(image, PATCH_R, mode="edge")

    def one(point):
        return jax.lax.dynamic_slice(padded, (point[0], point[1]), (S, S))

    return jax.vmap(one)(yx)  # [K, S, S]; slice start = yx - r + pad = yx


def orientations_patch(patches):
    r = F.PATCH_RADIUS
    offs = np.arange(S, dtype=np.float32) - PATCH_R
    dy = offs[:, None]
    dx = offs[None, :]
    circ = ((dy * dy + dx * dx) <= r * r).astype(np.float32)
    wx = jnp.asarray(dx * circ)
    wy = jnp.asarray(dy * circ)
    m10 = jnp.einsum("kij,ij->k", patches, wx)
    m01 = jnp.einsum("kij,ij->k", patches, wy)
    return jnp.arctan2(m01, m10)


def brief_patch(patches, angles, pattern=None):
    if pattern is None:
        pattern = F.BRIEF_PATTERN
    pat = jnp.asarray(pattern, jnp.float32)
    flat = patches.reshape(patches.shape[0], S * S)

    def one(row, angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        y1, x1, y2, x2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

        def rot(x, y):
            return x * c - y * s, x * s + y * c

        rx1, ry1 = rot(x1, y1)
        rx2, ry2 = rot(x2, y2)
        i1 = (jnp.round(ry1).astype(jnp.int32) + PATCH_R) * S + (
            jnp.round(rx1).astype(jnp.int32) + PATCH_R
        )
        i2 = (jnp.round(ry2).astype(jnp.int32) + PATCH_R) * S + (
            jnp.round(rx2).astype(jnp.int32) + PATCH_R
        )
        return (row[i1] < row[i2]).astype(jnp.uint8)

    return jax.vmap(one)(flat, angles)


def device_ms(body, args, iters=32):
    @jax.jit
    def chained(*xs):
        def it(i, carry):
            return body(*xs, carry) * 1e-20

        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    float(np.asarray(chained(*args)))
    start = time.perf_counter()
    float(np.asarray(chained(*args)))
    return (time.perf_counter() - start) / iters * 1e3


def main():
    h, w = 720, 1280
    k = 434  # L0 budget at 2000/8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
    yx = jnp.asarray(
        np.stack(
            [rng.integers(20, h - 20, k), rng.integers(20, w - 20, k)], axis=1
        ).astype(np.int32)
    )

    # Parity first.
    angle_ref = np.asarray(F.orientations(img, yx))
    patches = extract_patches(img, yx)
    angle_new = np.asarray(orientations_patch(patches))
    np.testing.assert_allclose(angle_new, angle_ref, atol=1e-4)
    desc_ref = np.asarray(F.brief_descriptors(img, yx, jnp.asarray(angle_ref)))
    desc_new = np.asarray(brief_patch(patches, jnp.asarray(angle_ref)))
    match = (desc_ref == desc_new).mean()
    print(f"parity: angles exact, descriptor bit agreement {match:.4f}")
    assert match > 0.999, match

    print(f"orient old : {device_ms(lambda x, c: F.orientations(x + c, yx).sum(), (img,)):7.3f} ms")
    print(f"brief  old : {device_ms(lambda x, c: F.brief_descriptors(x + c, yx, jnp.asarray(angle_ref)).astype(jnp.float32).sum(), (img,)):7.3f} ms")
    print(f"patches    : {device_ms(lambda x, c: extract_patches(x + c, yx).sum(), (img,)):7.3f} ms")
    print(f"orient new : {device_ms(lambda p, c: orientations_patch(p + c).sum(), (patches,)):7.3f} ms")
    print(f"brief  new : {device_ms(lambda p, c: brief_patch(p + c, jnp.asarray(angle_ref)).astype(jnp.float32).sum(), (patches,)):7.3f} ms")

    def fused_old(x, c):
        a = F.orientations(x + c, yx)
        return F.brief_descriptors(x + c, yx, a).astype(jnp.float32).sum()

    def fused_new(x, c):
        p = extract_patches(x + c, yx)
        a = orientations_patch(p)
        return brief_patch(p, a).astype(jnp.float32).sum()

    print(f"old orient+brief total: {device_ms(fused_old, (img,)):7.3f} ms")
    print(f"new patch pipeline    : {device_ms(fused_new, (img,)):7.3f} ms")


if __name__ == "__main__":
    main()
