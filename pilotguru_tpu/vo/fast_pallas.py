"""Pallas TPU kernel: fused FAST-9/16 response + 3x3 non-max suppression.

Replaces the two separate XLA passes of the extractor front-end
(vo.features.fast_scores + vo.features.nms3x3) with ONE trip of the image
through VMEM:

- The input image stays in HBM (``memory_space=ANY``); each grid step DMAs
  its own overlapping row-block halo window into a VMEM scratch buffer, so
  no pre-gathered halo copy is ever materialized in HBM (the v1 kernel's
  mistake: it stacked ``dynamic_slice`` windows host-side, paying the very
  extra image copy the kernel existed to avoid).
- The 16 brighter/darker circle masks are packed into one int32 bitword
  per pixel; the >=9-contiguous-bits arc test becomes 16-bit circular
  rotates on the packed word (binary-doubling run detection, 4 rotate+AND
  rounds). Two int32 arrays stay live instead of 32 boolean maps, which is
  what lets a 128-row block (vs v1's 16) fit in VMEM.
- The 3x3 NMS is computed in the same pass from one extra halo row of
  scores, so the raw-score map never makes an HBM round trip between
  response and suppression.

Semantics are identical to ``nms3x3(fast_scores(img, thr))`` +
``fast_scores(img, thr)``: FAST-9/16 contiguity on the 16-point Bresenham
circle, SAD-over-threshold response, zeroed 3-pixel border, strict local
maxima (ties keep the pixel, like ``scores >= reduce_window_max``).
Parity is asserted in tests (interpret mode on CPU) and re-asserted
compiled on the real chip by bench.py before timing.

Reference workload being accelerated: the pyramid FAST of ORBextractor.cc
(/root/reference/thirdparty/orb-slam2/src/ORBextractor.cc, 2000 features /
8 levels per calibrate.cc:518-531) — redesigned, not ported.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pilotguru_tpu.vo.features import FAST_CIRCLE

_HALO = 3  # FAST circle radius
_LANES = 128


def _rot16(x, k: int):
    """Circular right-rotate of the low 16 bits (bit t <- bit (t+k) mod 16),
    matching ``jnp.roll(bits, -k, axis=0)`` on the unpacked [16, ...] stack."""
    return ((x >> k) | (x << (16 - k))) & 0xFFFF


def _fast_nms_kernel(
    hbm_ref, raw_ref, nms_ref, scr, sem,
    *, threshold: float, block_rows: int, h: int, w: int, ws: int,
):
    """One row block: DMA halo window, FAST response, border zero, 3x3 NMS.

    hbm_ref: [Hp + 8, Wimg] padded image in HBM (row p <-> global row p-4,
    col q <-> global col q-3). scr: [block_rows + 8, Wimg] VMEM scratch.
    raw_ref / nms_ref: [block_rows, ws] output blocks.
    """
    i = pl.program_id(0)
    r = block_rows
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * r, r + 8)], scr, sem
    )
    dma.start()
    dma.wait()
    blk = scr[:]

    # Scores for rows rr in [0, r+2) <-> global rows i*r + rr - 1 (one halo
    # row above and below for the NMS window), full lane-aligned width ws
    # (col cc <-> global col cc; center at padded col cc+3).
    center = blk[3 : r + 5, 3 : ws + 3]
    bright_pack = jnp.zeros(center.shape, jnp.int32)
    dark_pack = jnp.zeros(center.shape, jnp.int32)
    bright_sum = jnp.zeros(center.shape, jnp.float32)
    dark_sum = jnp.zeros(center.shape, jnp.float32)
    for t, (dy, dx) in enumerate(FAST_CIRCLE):
        tap = blk[3 + dy : 3 + dy + r + 2, 3 + dx : 3 + dx + ws]
        d = tap - center
        b = d > threshold
        k = d < -threshold
        bit = jnp.int32(1 << t)
        bright_pack = bright_pack | jnp.where(b, bit, 0)
        dark_pack = dark_pack | jnp.where(k, bit, 0)
        bright_sum = bright_sum + jnp.where(b, d - threshold, 0.0)
        dark_sum = dark_sum + jnp.where(k, -d - threshold, 0.0)

    def has_arc(p):
        # >= 9 contiguous set bits on the 16-cycle: R_2k = R_k & rot(R_k, k).
        r2 = p & _rot16(p, 1)
        r4 = r2 & _rot16(r2, 2)
        r8 = r4 & _rot16(r4, 4)
        return (r8 & _rot16(p, 8)) != 0

    corner = has_arc(bright_pack) | has_arc(dark_pack)
    score = jnp.where(
        corner, jnp.maximum(bright_sum, dark_sum), 0.0
    ).astype(raw_ref.dtype)

    # Zero the 3-pixel image border BEFORE the NMS max, exactly like the
    # jnp path (fast_scores zeroes, then nms3x3 compares).
    grow = (
        jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + i * r - 1
    )
    gcol = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    interior = (
        (grow >= _HALO) & (grow < h - _HALO)
        & (gcol >= _HALO) & (gcol < w - _HALO)
    )
    z = jnp.where(interior, score, 0.0)

    raw_ref[:] = z[1 : r + 1, :]

    # 3x3 max: vertical triple-max on the r output rows, then horizontal
    # with zero shifted in at the lane edges (true neighbors there are
    # border-zeroed, and scores are >= 0, so 0-padding == -inf-padding).
    vert = jnp.maximum(jnp.maximum(z[0:r, :], z[1 : r + 1, :]), z[2 : r + 2, :])
    hpad = jnp.pad(vert, ((0, 0), (1, 1)))
    nbr = jnp.maximum(
        jnp.maximum(hpad[:, 0:ws], hpad[:, 1 : ws + 1]), hpad[:, 2 : ws + 2]
    )
    mid = z[1 : r + 1, :]
    nms_ref[:] = jnp.where(mid >= nbr, mid, 0.0)


def _pick_block_rows(h: int) -> int:
    """Largest-utilization row block <= 128, sublane-aligned (multiple of
    8): the fewest grid steps whose blocks still fit VMEM comfortably."""
    blocks = -(-h // 128)
    return -(-(-(-h // blocks)) // 8) * 8


@partial(
    jax.jit, static_argnames=("threshold", "block_rows", "interpret")
)
def fast_nms_pallas(
    image,
    threshold: float = 20.0 / 255.0,
    block_rows: int = 0,
    interpret: bool = False,
):
    """Fused FAST response + 3x3 NMS. image: [H, W] f32 in [0, 1].

    Returns (raw, nms), both [H, W]: raw == features.fast_scores(image,
    threshold), nms == features.nms3x3(raw).
    """
    h, w = image.shape
    r = block_rows or _pick_block_rows(h)
    h_blocks = -(-h // r)
    hp = h_blocks * r
    ws = -(-w // _LANES) * _LANES  # lane-aligned output/score width
    wimg = ws + _LANES  # taps reach ws + 5; one extra lane tile
    padded = jnp.pad(
        image,
        ((4, hp - h + 4), (_HALO, wimg - w - _HALO)),
        mode="edge",
    )  # [hp + 8, wimg]; row p <-> global p-4, col q <-> global q-3

    raw, nms = pl.pallas_call(
        partial(
            _fast_nms_kernel,
            threshold=threshold, block_rows=r, h=h, w=w, ws=ws,
        ),
        grid=(h_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((r, ws), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, ws), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp, ws), image.dtype),
            jax.ShapeDtypeStruct((hp, ws), image.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((r + 8, wimg), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Mosaic's conservative liveness over the unrolled 16-tap loop
        # wants ~35 MB of scoped VMEM at r=120; the default scoped limit
        # is 16 MB but v5e VMEM is 128 MB physical — raise the cap instead
        # of shrinking blocks (fewer grid steps wins, measured
        # tools/bench_fast_pallas.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(padded)
    return raw[:h, :w], nms[:h, :w]


def fast_scores_pallas(
    image,
    threshold: float = 20.0 / 255.0,
    block_rows: int = 0,
    interpret: bool = False,
):
    """Raw FAST response only (drop-in for features.fast_scores)."""
    return fast_nms_pallas(
        image, threshold, block_rows=block_rows, interpret=interpret
    )[0]
