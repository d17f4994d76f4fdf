"""On-chip race: fused Pallas FAST+NMS kernel vs the XLA (jnp) two-pass
path, at 720p and 1080p, plus full-extractor impact.

Uses the two-chain-length differencing timer (see bench.py) so the remote
tunnel's fixed RTT cancels. Run from /root/repo:
    python tools/bench_fast_pallas.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pilotguru_tpu.vo.features import fast_scores, nms3x3  # noqa: E402
from pilotguru_tpu.vo.fast_pallas import fast_nms_pallas  # noqa: E402


def device_ms(body, args, iters=128):
    def chain(n):
        @jax.jit
        def chained(*xs):
            def it(i, carry):
                return body(*xs, carry) * 1e-20

            return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

        float(np.asarray(chained(*args)))
        best = np.inf
        for _ in range(3):
            start = time.perf_counter()
            float(np.asarray(chained(*args)))
            best = min(best, time.perf_counter() - start)
        return best

    half = max(iters // 2, 1)
    return max(chain(2 * half) - chain(half), 0.0) / half * 1e3


def jnp_pair(img, c):
    raw = fast_scores(img + c, 20.0 / 255.0)
    return raw.sum() + nms3x3(raw).sum()


def pallas_pair(img, c):
    raw, nms = fast_nms_pallas(img + c, 20.0 / 255.0)
    return raw.sum() + nms.sum()


def main():
    rng = np.random.default_rng(0)
    for h, w in [(720, 1280), (1080, 1920)]:
        img = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
        # Parity on the real chip first.
        want_raw = np.asarray(fast_scores(img, 20.0 / 255.0))
        want_nms = np.asarray(nms3x3(jnp.asarray(want_raw)))
        raw, nms = fast_nms_pallas(img, 20.0 / 255.0)
        np.testing.assert_allclose(np.asarray(raw), want_raw, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nms), want_nms, atol=1e-5)
        assert ((np.asarray(nms) > 0) == (want_nms > 0)).all()
        j = device_ms(jnp_pair, (img,), 64)
        p = device_ms(pallas_pair, (img,), 64)
        print(f"{h}x{w}: jnp fast+nms {j:.3f} ms  pallas fused {p:.3f} ms "
              f"({j / p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
