"""A/B probe: fused analysis+scatter (fft4_hist) vs the composed
fft4_deposits(reach) → histogram_matmul path, on the live TPU backend.

Run: python bench_probes/fused_hist_ab.py [--quick]
Methodology: emspec.bench.measure.chain_marginal_ms (BENCH.md).
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.dsp.pallas.fft4 import fft4_deposits, fft4_hist
from emspec.dsp.pallas.scatter import histogram_matmul

QUICK = "--quick" in sys.argv

SHAPES = [
    # (name, n, hop, b, rows, R)
    ("primary_8192", 8192, 2048, 88, 512, 2),
    ("stress_32768", 32768, 8192, 688, 512, 2),
]

def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(5)
    a_ = np.float32(np.log2(20.0))
    b_ = np.float32(511 / (np.log2(48000.0) - np.log2(20.0)))
    floor = np.float32(1e-12)

    for name, n, hop, b, rows, R in SHAPES:
        if QUICK and b > 100:
            b = 96
        P = 2 * R + 1
        sr = 96000.0 if n == 32768 else 48000.0
        frames = jnp.asarray(
            (0.1 * rng.standard_normal((b, n))
             + np.sin(2 * np.pi * 440.0 / sr * np.arange(n))[None]
             ).astype(np.float32))

        def composed(fr):
            ids, contrib = fft4_deposits(fr, a_, b_, floor, n=n, hop=hop,
                                         sr=sr, rows=rows, reach=R)
            return histogram_matmul(ids, contrib, P * rows)

        def fused(fr, t_tile=2, row_chunk=8):
            return fft4_hist(fr, a_, b_, floor, -2**30, n=n, hop=hop,
                             sr=sr, rows=rows, reach=R,
                             t_tile=t_tile, row_chunk=row_chunk)

        # parity on chip first
        want = np.asarray(jax.jit(composed)(frames))
        got = np.asarray(jax.jit(lambda fr: fused(fr))(frames))
        rel = np.abs(got - want).max() / max(want.max(), 1e-30)
        print(f"{name}: on-chip parity rel-to-peak {rel:.2e}")
        assert rel < 1e-4, "parity failed"

        def time_of(fn):
            k = 8
            step = probe_chain(fn, frames)
            f = jax.jit(lambda c: jax.lax.scan(
                lambda p, _: (step(p), 0.0), c, None, length=k)[0])
            return chain_marginal_ms(f, lambda: jnp.float32(0.0), k,
                                     reps=3 if QUICK else 5)

        t_comp = time_of(composed)
        print(f"{name}: composed {t_comp:.3f} ms/call")
        for tt in (1, 2, 4, 8):
            for cc in (16, 32):
                t_f = time_of(lambda fr, tt=tt, cc=cc: fused(fr, tt, cc))
                print(f"{name}: fused t_tile={tt} row_chunk={cc} "
                      f"{t_f:.3f} ms/call  ({t_comp / max(t_f, 1e-9):.2f}x)")

if __name__ == "__main__":
    main()
