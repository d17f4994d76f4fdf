"""Pallas TPU kernel: pipelined per-keypoint patch gather.

The extractor's hottest stage on-chip is not FAST but the per-keypoint
patch gather feeding the orientation moments and the BRIEF matmul
(tools/profile_extract.py: 0.73 ms of the 2.1 ms 720p extract): XLA
lowers ``vmap(dynamic_slice)`` over K keypoints to one serial gather of
39x39 windows with unaligned lane handling on every row.

Patch extraction is pure data movement, so this kernel makes the DMA
engines do it: keypoint coordinates arrive via scalar prefetch
(PrefetchScalarGridSpec) ahead of the kernel body, the image stays in
HBM (``memory_space=ANY``), and each grid step issues a GROUP of P patch
copies HBM->VMEM while the previous group's copies drain — a two-deep
group pipeline with P DMAs in flight per slot, so per-copy latency
overlaps P*2 ways and throughput approaches DMA-engine issue rate.

TPU memrefs are (8, 128)-tiled, so a DMA source slice must start on a
tile boundary: each copy fetches the aligned (s_pad + 8) x 256 window
containing the patch, and the kernel shifts by the in-tile remainder —
a dynamic lane rotate (``pltpu.roll``) for dx, and an 8-way switch over
static sublane slices for dy (dynamic sublane rotate miscompiles on
this window shape on v5e) — before emitting the aligned patch block.

Output is [K, S_PAD, 128] (sublane/lane-aligned patch windows whose
top-left is the requested coordinate); the wrapper slices to the
[K, S, S] contract of features.extract_patches. Semantics match
features.extract_patches exactly (edge-padded image, patch (i, j) =
padded[y + i, x + j]).

Reference workload: ORBextractor.cc IC_Angle + computeOrbDescriptor per
keypoint (/root/reference/thirdparty/orb-slam2/src/ORBextractor.cc) —
redesigned as block DMA + downstream matmuls, not ported.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_GROUP = 8  # patches per grid step (P DMAs in flight per slot)


def _patch_kernel(yx_ref, img_ref, out_ref, scratch, sems, *, s_pad: int):
    """Grid step g: wait group g's P copies (started at step g-1), start
    group g+1's, rotate out the in-tile remainders, emit group g.

    yx_ref (scalar prefetch): [Kp, 4] = (y_aligned/8, x_aligned/128, dy, dx).
    scratch: [2, P, s_pad + 8, 2 * _LANES]."""
    g = pl.program_id(0)
    n = pl.num_programs(0)
    rows = s_pad + 8

    def copies(slot, grp):
        out = []
        for j in range(_GROUP):
            k = grp * _GROUP + j
            out.append(
                pltpu.make_async_copy(
                    img_ref.at[
                        pl.ds(yx_ref[k, 0] * 8, rows),
                        pl.ds(yx_ref[k, 1] * _LANES, 2 * _LANES),
                    ],
                    scratch.at[slot, j],
                    sems.at[slot, j],
                )
            )
        return out

    @pl.when(g == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(g + 1 < n)
    def _():
        for c in copies((g + 1) % 2, g + 1):
            c.start()

    for c in copies(g % 2, g):
        c.wait()
    for j in range(_GROUP):
        k = g * _GROUP + j
        win = scratch[g % 2, j]
        # Shift the in-tile remainder to the window origin. Lanes: one
        # dynamic circular rotate — dx <= 127 with 128 payload lanes in
        # 256, so no wrapped element lands in the emitted block. Sublanes:
        # dynamic rotate MISCOMPILES on this window shape (measured on
        # v5e: rotates by dy+32 on a 48-row array — isolated repro in the
        # file history), so the dy in [0, 8) remainder is an 8-way switch
        # over STATIC sublane slices instead.
        win = pltpu.roll(win, -yx_ref[k, 3], 1)
        out_ref[j] = jax.lax.switch(
            yx_ref[k, 2],
            [
                lambda w=win, d=d: w[d : d + s_pad, :_LANES]
                for d in range(8)
            ],
        )


def _blur_patch_kernel(
    yx_ref, img_ref, g_ref, out_ref, scratch, sems,
    *, s_pad: int, taps: int,
):
    """Fused gather + separable Gaussian blur. Grid step g: wait group g's
    P raw-window copies, start group g+1's, blur each window vertically
    then horizontally with the ``taps``-tap kernel in VMEM, emit the
    blurred [s_pad, 128] patches.

    yx_ref: [Kp, 4] = (y_aligned/8, x_aligned/128, dy, dx) of the RAW
    window top-left (patch top-left minus the blur radius, pre-offset by
    the wrapper's padding). scratch: [2, P, 64, 2 * _LANES]."""
    g = pl.program_id(0)
    n = pl.num_programs(0)
    halo = taps - 1  # 2 * blur radius

    def copies(slot, grp):
        out = []
        for j in range(_GROUP):
            k = grp * _GROUP + j
            out.append(
                pltpu.make_async_copy(
                    img_ref.at[
                        pl.ds(yx_ref[k, 0] * 8, 64),
                        pl.ds(yx_ref[k, 1] * _LANES, 2 * _LANES),
                    ],
                    scratch.at[slot, j],
                    sems.at[slot, j],
                )
            )
        return out

    @pl.when(g == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(g + 1 < n)
    def _():
        for c in copies((g + 1) % 2, g + 1):
            c.start()

    for c in copies(g % 2, g):
        c.wait()
    rows = s_pad + halo  # raw rows feeding the vertical pass
    for j in range(_GROUP):
        k = g * _GROUP + j
        win = scratch[g % 2, j]
        # In-tile remainders: dynamic lane rotate for dx (correct on v5e),
        # 8-way static-slice switch for dy (dynamic sublane rotate is not,
        # see _patch_kernel).
        win = pltpu.roll(win, -yx_ref[k, 3], 1)
        win = jax.lax.switch(
            yx_ref[k, 2],
            [lambda w=win, d=d: w[d : d + rows, :] for d in range(8)],
        )
        # Separable blur: 17 shifted multiply-adds per axis, all static
        # slices. Columns beyond the patch payload may blend wrapped
        # lanes when dx is large — they are finite and downstream weight
        # matrices are zero outside the [size, size] payload.
        vert = g_ref[0, 0] * win[0:s_pad, :]
        for u in range(1, taps):
            vert = vert + g_ref[0, u] * win[u : u + s_pad, :]
        out = g_ref[0, 0] * vert[:, 0:_LANES]
        for v in range(1, taps):
            out = out + g_ref[0, v] * vert[:, v : v + _LANES]
        out_ref[j] = out


@partial(jax.jit, static_argnames=("size", "sigma", "interpret"))
def gather_blurred_patches_pallas(
    image, yx, size: int, sigma: float = 2.0, interpret: bool = False
):
    """Fused ``gaussian_blur`` + ``extract_patches``: one (size x size)
    BLURRED patch per keypoint, [K, size, size], without ever
    materializing the blurred image.

    The full-image Gaussian blur exists in the extractor ONLY to feed the
    per-keypoint descriptor patches (features.extract_orb_features), so
    blurring 2000 small windows in VMEM replaces a full-image separable
    blur + gather round trip through HBM — and its cost is independent of
    image resolution.

    Interior parity is exact vs blur-then-gather (same taps, same fp
    order per pixel up to the separable pass association the XLA path
    also uses). Within ``blur_radius + radius`` of the image border the
    two differ by construction: the XLA path clamps the BLURRED map at
    the edge (edge-pad after blur), this kernel blurs the edge-padded raw
    image. Both are boundary heuristics; tests pin interior exactness.
    """
    from pilotguru_tpu.ml.augmentation import _gaussian_kernel

    kernel, blur_radius = _gaussian_kernel(sigma, image.dtype)
    taps = 2 * blur_radius + 1
    radius = (size - 1) // 2
    h, w = image.shape
    k = yx.shape[0]
    s_pad = -(-size // 8) * 8
    kp = -(-k // _GROUP) * _GROUP
    if s_pad + taps - 1 + 7 > 64:
        raise ValueError(
            f"patch window {s_pad} + blur halo {taps - 1} exceeds the "
            "64-row DMA window"
        )
    # Reflect-pad the blur halo (matching gaussian_blur), then edge-pad
    # the patch overhang + DMA slack. Raw-window top-left for keypoint
    # (ky, kx) lands at padded (ky, kx): image row ky - radius -
    # blur_radius + (blur_radius + radius) of padding.
    reflected = jnp.pad(image, blur_radius, mode="reflect")
    padded = jnp.pad(
        reflected,
        ((radius, 64), (radius, 2 * _LANES)),
        mode="edge",
    )
    wp_lane = -(-padded.shape[1] // _LANES) * _LANES
    padded = jnp.pad(padded, ((0, 0), (0, wp_lane - padded.shape[1])))
    hp, wp = padded.shape
    yx = jnp.concatenate(
        [yx.astype(jnp.int32), jnp.zeros((kp - k, 2), jnp.int32)]
    )
    y = jnp.clip(yx[:, 0], 0, hp - 64)
    x = jnp.clip(yx[:, 1], 0, wp - 2 * _LANES)
    coords = jnp.stack([y // 8, x // _LANES, y % 8, x % _LANES], axis=1)

    out = pl.pallas_call(
        partial(_blur_patch_kernel, s_pad=s_pad, taps=taps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kp // _GROUP,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_GROUP, s_pad, _LANES),
                lambda g, yx: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _GROUP, 64, 2 * _LANES), image.dtype),
                pltpu.SemaphoreType.DMA((2, _GROUP)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, s_pad, _LANES), image.dtype),
        interpret=interpret,
    )(coords, padded, kernel.reshape(1, taps))
    return out[:k, :size, :size]


@partial(jax.jit, static_argnames=("size", "interpret"))
def gather_patches_pallas(image, yx, size: int, interpret: bool = False):
    """Gather one (size x size) patch per keypoint: [K, size, size].

    image: [H, W] f32; yx: [K, 2] int32 (row, col) patch top-left in
    IMAGE coordinates offset by the caller's pad convention — identical
    contract to features.extract_patches with radius = (size - 1) // 2:
    patch (i, j) = edge_padded(image, radius)[y + i, x + j].
    """
    radius = (size - 1) // 2
    h, w = image.shape
    k = yx.shape[0]
    s_pad = -(-size // 8) * 8
    kp = -(-k // _GROUP) * _GROUP
    # Edge-pad like extract_patches, plus DMA slack: the aligned window
    # spans up to y + s_pad + 7 rows and x + 255 cols (y <= h - 1 + radius
    # after offset... conservatively: align-down start + window extent).
    padded = jnp.pad(
        image,
        ((radius, s_pad - radius + 16), (radius, 2 * _LANES - radius + 8)),
        mode="edge",
    )
    hp, wp = padded.shape
    yx = jnp.concatenate(
        [yx.astype(jnp.int32), jnp.zeros((kp - k, 2), jnp.int32)]
    )
    # Clip so every DMA window stays in bounds whatever the caller sends,
    # then split into tile-aligned starts + in-tile remainders.
    y = jnp.clip(yx[:, 0], 0, hp - (s_pad + 8))
    x = jnp.clip(yx[:, 1], 0, wp - 2 * _LANES)
    coords = jnp.stack([y // 8, x // _LANES, y % 8, x % _LANES], axis=1)

    out = pl.pallas_call(
        partial(_patch_kernel, s_pad=s_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kp // _GROUP,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (_GROUP, s_pad, _LANES),
                lambda g, yx: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, _GROUP, s_pad + 8, 2 * _LANES), image.dtype
                ),
                pltpu.SemaphoreType.DMA((2, _GROUP)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, s_pad, _LANES), image.dtype),
        interpret=interpret,
    )(coords, padded)
    return out[:k, :size, :size]
