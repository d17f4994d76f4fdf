"""Pallas TPU kernel for the FAST-9/16 corner response.

The jnp implementation (vo.features.fast_scores) materializes 16 rolled
copies of the full image, paying ~16x the image's HBM traffic per frame.
This kernel streams row blocks (with a 3-row halo) through VMEM once and
computes all 16 circle taps as in-block static slices, so each input pixel
crosses HBM once (plus the small halo duplication between row blocks).

Semantics are identical to fast_scores: FAST-9/16 contiguity on the
16-point Bresenham circle, SAD-over-threshold response, zeroed 3-pixel
border. Parity is asserted in tests (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pilotguru_tpu.vo.features import FAST_CIRCLE

_HALO = 3
_LANES = 128


def _fast_kernel(img_ref, out_ref, *, threshold: float, block_rows: int):
    """img_ref: [1, block_rows + 6, Wp] halo window; out_ref: [block_rows, Wp]."""
    w = out_ref.shape[1] - 2 * _HALO
    blk = img_ref[0]
    center = blk[_HALO : _HALO + block_rows, _HALO : _HALO + w]

    # Stream the 16 taps: accumulate the SAD response immediately so only
    # the boolean masks stay live for the contiguity test (keeps the kernel
    # inside scoped VMEM).
    brighter = []
    darker = []
    bright_sum = jnp.zeros_like(center)
    dark_sum = jnp.zeros_like(center)
    for dy, dx in FAST_CIRCLE:
        tap = blk[
            _HALO + dy : _HALO + dy + block_rows,
            _HALO + dx : _HALO + dx + w,
        ]
        d = tap - center
        b = d > threshold
        k = d < -threshold
        bright_sum = bright_sum + jnp.where(b, d - threshold, 0.0)
        dark_sum = dark_sum + jnp.where(k, -d - threshold, 0.0)
        brighter.append(b)
        darker.append(k)

    def has_arc(bits):
        # >= 9 contiguous set bits on the 16-cycle via binary-doubling run
        # detection (R_2k(i) = R_k(i) & R_k(i+k)): 64 ANDs instead of the
        # naive 16x8 chain (static unroll, pure VPU work).
        r2 = [bits[i] & bits[(i + 1) % 16] for i in range(16)]
        r4 = [r2[i] & r2[(i + 2) % 16] for i in range(16)]
        r8 = [r4[i] & r4[(i + 4) % 16] for i in range(16)]
        any_arc = None
        for i in range(16):
            run = r8[i] & bits[(i + 8) % 16]
            any_arc = run if any_arc is None else jnp.logical_or(any_arc, run)
        return any_arc

    corner = jnp.logical_or(has_arc(brighter), has_arc(darker))
    response = jnp.maximum(bright_sum, dark_sum)
    result = jnp.where(corner, response, 0.0)
    out_ref[:] = jnp.pad(result, ((0, 0), (_HALO, _HALO)))


@partial(jax.jit, static_argnames=("threshold", "block_rows", "interpret"))
def fast_scores_pallas(
    image,
    threshold: float = 20.0 / 255.0,
    block_rows: int = 16,
    interpret: bool = False,
):
    """Drop-in replacement for vo.features.fast_scores. image: [H, W] f32."""
    h, w = image.shape
    h_blocks = -(-h // block_rows)
    h_pad = h_blocks * block_rows
    # Lane-align the padded width (halo + out-width + alignment slack).
    wp = -(-(w + 2 * _HALO) // _LANES) * _LANES
    padded = jnp.pad(
        image,
        ((_HALO, h_pad - h + _HALO), (_HALO, wp - w - _HALO)),
        mode="edge",
    )  # [h_pad + 6, wp]

    # BlockSpec offsets are block-shape multiples, so overlapping halo reads
    # are expressed by pre-gathering each block's (rows + 6)-row window.
    windows = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(
                padded, i * block_rows, block_rows + 2 * _HALO, axis=0
            )
            for i in range(h_blocks)
        ]
    )  # [blocks, rows + 6, wp]

    out = pl.pallas_call(
        partial(_fast_kernel, threshold=threshold, block_rows=block_rows),
        grid=(h_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, block_rows + 2 * _HALO, wp),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (block_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, wp), image.dtype),
        interpret=interpret,
    )(windows)

    scores = out[:h, _HALO : _HALO + w]
    # Zero the 3-pixel border like the reference implementation.
    mask = (
        jnp.zeros((h, w), bool)
        .at[_HALO : h - _HALO, _HALO : w - _HALO]
        .set(True)
    )
    return jnp.where(mask, scores, 0.0)
