"""Race a matmul formulation of steered BRIEF against the gather paths.

The gather race (tools/bench_brief_variants.py) showed the per-keypoint
512-value gather IS the cost (3.1 ms either way at the L0 budget). This
prototype removes gathers from the descriptor entirely:

- quantize the keypoint angle into NUM_BINS bins (the original ORB paper
  discretizes steering to 2*pi/30; we use 32 for a power of two), and
- precompute, per bin, a sparse {-1, 0, +1} selection matrix D[S*S, 256]
  with +1 at the rotated tap-1 pixel and -1 at tap-2, so
      value[k, j] = patch_flat[k] @ D[bin_k][:, j] = v1 - v2,
      bit[k, j]   = value < 0   (exactly (v1 < v2), ties -> 0),
- evaluate ALL bins in one MXU matmul [K, S*S] @ [S*S, BINS*256] and
  collapse the bin axis with a one-hot einsum (no gather).

Two numeric paths are raced: fp32 with Precision.HIGHEST (exact: each
column has <= 2 nonzeros, so the sum is a single fp32 subtraction) and
int8 (patch recentred by -128 after 0..255 quantization; products and the
2-term sum are exact in int32).

Run from /root/repo:  python tools/bench_brief_matmul.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pilotguru_tpu.vo import features as F  # noqa: E402

PATCH_R = 19
S = 2 * PATCH_R + 1
NUM_BINS = 32


def build_bin_matrix(pattern=None, num_bins=NUM_BINS):
    if pattern is None:
        pattern = F.BRIEF_PATTERN
    pat = np.asarray(pattern, np.float32)  # [256, 4] (y1, x1, y2, x2)
    d = np.zeros((S * S, num_bins, pat.shape[0]), np.float32)
    for b in range(num_bins):
        ang = 2 * np.pi * b / num_bins
        c, s = np.cos(ang), np.sin(ang)
        y1, x1, y2, x2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
        rx1, ry1 = x1 * c - y1 * s, x1 * s + y1 * c
        rx2, ry2 = x2 * c - y2 * s, x2 * s + y2 * c
        i1 = (np.round(ry1).astype(int) + PATCH_R) * S + (
            np.round(rx1).astype(int) + PATCH_R
        )
        i2 = (np.round(ry2).astype(int) + PATCH_R) * S + (
            np.round(rx2).astype(int) + PATCH_R
        )
        for j in range(pat.shape[0]):
            d[i1[j], b, j] += 1.0
            d[i2[j], b, j] -= 1.0
    return d.reshape(S * S, num_bins * pat.shape[0])


def extract_patches(image, yx):
    padded = jnp.pad(image, PATCH_R, mode="edge")

    def one(point):
        return jax.lax.dynamic_slice(padded, (point[0], point[1]), (S, S))

    return jax.vmap(one)(yx)


def angle_bins(angles, num_bins=NUM_BINS):
    b = jnp.round(angles / (2 * jnp.pi / num_bins)).astype(jnp.int32)
    return jnp.mod(b, num_bins)


def brief_matmul_f32(patches, angles, d_mat):
    k = patches.shape[0]
    flat = patches.reshape(k, S * S)
    vals = jax.lax.dot(
        flat, d_mat, precision=jax.lax.Precision.HIGHEST
    ).reshape(k, NUM_BINS, -1)
    onehot = jax.nn.one_hot(angle_bins(angles), NUM_BINS, dtype=vals.dtype)
    picked = jnp.einsum("kbj,kb->kj", vals, onehot)
    return (picked < 0).astype(jnp.uint8)


def brief_matmul_i8(patches, angles, d_mat_i8):
    k = patches.shape[0]
    q = jnp.clip(jnp.round(patches * 255.0), 0, 255) - 128.0
    flat = q.astype(jnp.int8).reshape(k, S * S)
    vals = jax.lax.dot_general(
        flat,
        d_mat_i8,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(k, NUM_BINS, -1)
    onehot = jax.nn.one_hot(angle_bins(angles), NUM_BINS, dtype=jnp.int32)
    picked = jnp.einsum("kbj,kb->kj", vals, onehot)
    return (picked < 0).astype(jnp.uint8)


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
    k = 434
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
    yx = jnp.asarray(
        np.stack(
            [rng.integers(20, h - 20, k), rng.integers(20, w - 20, k)], axis=1
        ).astype(np.int32)
    )
    d_np = build_bin_matrix()
    d_f32 = jnp.asarray(d_np)
    d_i8 = jnp.asarray(d_np.astype(np.int8))

    angles = jnp.asarray(np.asarray(F.orientations(img, yx)))
    patches = extract_patches(img, yx)
    desc_ref = np.asarray(F.brief_descriptors(img, yx, angles))
    for name, fn, dm in [
        ("f32", brief_matmul_f32, d_f32),
        ("i8 ", brief_matmul_i8, d_i8),
    ]:
        desc = np.asarray(fn(patches, angles, dm))
        agree = (desc == desc_ref).mean()
        print(f"{name} bit agreement vs exact-angle gather: {agree:.4f}")

    print(
        "brief matmul f32:"
        f" {device_ms(lambda p, c: brief_matmul_f32(p + c, angles, d_f32).astype(jnp.float32).sum(), (patches,)):7.3f} ms"
    )
    print(
        "brief matmul i8 :"
        f" {device_ms(lambda p, c: brief_matmul_i8(p + c, angles, d_i8).astype(jnp.float32).sum(), (patches,)):7.3f} ms"
    )

    def fused(x, c):
        p = extract_patches(x + c, yx)
        offs = np.arange(S, dtype=np.float32) - PATCH_R
        dy, dx = offs[:, None], offs[None, :]
        circ = ((dy * dy + dx * dx) <= F.PATCH_RADIUS**2).astype(np.float32)
        m10 = jnp.einsum("kij,ij->k", p, jnp.asarray(dx * circ))
        m01 = jnp.einsum("kij,ij->k", p, jnp.asarray(dy * circ))
        a = jnp.arctan2(m01, m10)
        return brief_matmul_i8(p, a, d_i8).astype(jnp.float32).sum()

    print(f"patch+orient+brief-i8 pipeline: {device_ms(fused, (img,)):7.3f} ms")


if __name__ == "__main__":
    main()
