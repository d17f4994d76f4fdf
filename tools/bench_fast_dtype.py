"""Time FAST-9/16 response in fp32 vs bf16 on the chip.

fast_scores is VPU-bound elementwise work (16 circle taps x compare + SAD);
TPU vector units run bf16 at up to 2x fp32 throughput, and the FAST
threshold test (|diff| vs 20/255 on [0,1] pixels from 8-bit video) is far
above bf16 resolution (~0.004 at 1.0), so a bf16 compute path may halve the
largest remaining extract term without score-ordering changes that matter.
Parity: corner SET must match fp32 closely; response values may differ in
low bits (grid top-k ordering ties are what to watch).

Run from /root/repo:  python tools/bench_fast_dtype.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pilotguru_tpu.vo import features as F  # noqa: E402


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
    thr = 20.0 / 255.0
    rng = np.random.default_rng(0)
    img8 = rng.integers(0, 256, size=(h, w))
    img = jnp.asarray((img8 / 255.0).astype(np.float32))

    s32 = np.asarray(F.fast_scores(img, thr))

    def fast_bf16(x, threshold):
        s = F.fast_scores(x.astype(jnp.bfloat16), jnp.bfloat16(threshold))
        return s.astype(jnp.float32)

    sbf = np.asarray(fast_bf16(img, thr))
    corner_match = ((s32 > 0) == (sbf > 0)).mean()
    resp_rel = np.abs(sbf - s32)[s32 > 0] / np.maximum(s32[s32 > 0], 1e-9)
    print(
        f"corner-set agreement {corner_match:.6f}; "
        f"response rel err p50/p99 {np.percentile(resp_rel, 50):.4f}/"
        f"{np.percentile(resp_rel, 99):.4f}"
    )

    print(f"fast fp32 : {device_ms(lambda x, c: F.fast_scores(x + c, thr).sum(), (img,)):7.3f} ms")
    print(f"fast bf16 : {device_ms(lambda x, c: fast_bf16(x + c, thr).sum(), (img,)):7.3f} ms")

    # Downstream-equivalence probe: does grid top-k pick the same corners?
    yx32, _, v32 = F.select_grid_topk(F.nms3x3(jnp.asarray(s32)), 434)
    yxbf, _, vbf = F.select_grid_topk(F.nms3x3(jnp.asarray(sbf)), 434)
    same = (
        (np.asarray(yx32)[np.asarray(v32)] ==
         np.asarray(yxbf)[np.asarray(vbf)]).all()
        if v32.sum() == vbf.sum()
        else False
    )
    print(f"grid top-k identical: {bool(same)}")


if __name__ == "__main__":
    main()
