"""Per-bank multires scatter A/B at the CURRENT default geometry.

The round-2 per-bank numbers (BENCH.md item 20) predate the round-3
|Δt| ≤ N/2 tightening, which halved every bank's reach and flipped the
2048 bank to the pallas backend.  The full-report stage breakdown still
shows the scatter at ~1.10 ms of the 1.33 ms multires call (83%), so
this probe isolates WHERE inside the mixed scatter that time goes:
for each bank, both backends are timed on the bank's real deposits
(band-sliced m, real reach) with the scan-marginal methodology.

Run: python bench_probes/multires_bank_ab.py [--quick]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.config import Settings
from emspec.io import synth
from emspec.pipeline import Pipeline

QUICK = "--quick" in sys.argv


def main():
    print("backend:", jax.default_backend())
    s = Settings(mode="enhanced", multires=True)
    pipe = Pipeline(s)
    secs = 4.0
    rng = np.random.default_rng(7)
    x = (synth.chirp(30.0, 20000.0, secs, sample_rate=s.sample_rate)
         + synth.multitone([55.0, 220.0, 880.0, 3520.0], secs,
                           sample_rate=s.sample_rate, amplitude=0.3)
         + 0.05 * rng.standard_normal(int(secs * s.sample_rate)).astype(
             np.float32))
    xd = jax.device_put(np.asarray(x, np.float32))
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()

    dep = jax.jit(
        lambda xx: pipe._deposits_banked(pipe._bank_inputs(xx, t_count), p)
    )(xd)
    rows_l, delta_l, contrib_l = jax.tree.map(jax.device_put, dep)

    def time_of(fn, first_arg, k=8):
        step = probe_chain(fn, first_arg)
        f = jax.jit(lambda c: jax.lax.scan(
            lambda q, _: (step(q), 0.0), c, None, length=k)[0])
        return chain_marginal_ms(f, lambda: jnp.float32(0.0), k,
                                 reps=3 if QUICK else 5)

    total = {"pallas": 0.0, "segsum": 0.0}
    for row, delta, contrib, n in zip(rows_l, delta_l, contrib_l,
                                      pipe.sizes):
        R_b = int(np.round(n / (2.0 * pipe.hop)))
        P = 2 * R_b + 1
        m = row.shape[-1]
        print(f"bank {n}: m={m} t={t_count} R={R_b} "
              f"S={P * pipe.rows} "
              f"(policy: {'pallas' if P * pipe.rows <= 16384 else 'segsum'})")

        def f_pallas(c, row=row, delta=delta, R_b=R_b):
            ids = (delta + R_b) * pipe.rows + row
            return pipe._scatter_pallas(ids, c, t_count, R=R_b)

        def f_seg(c, row=row, delta=delta):
            return pipe._scatter_segment_sum(row, delta, c, t_count, ())

        tp = time_of(f_pallas, contrib)
        ts = time_of(f_seg, contrib)
        total["pallas"] += tp
        total["segsum"] += ts
        print(f"  pallas {tp:.3f} ms   segment_sum {ts:.3f} ms")
    print(f"sum-if-all-pallas {total['pallas']:.3f} ms  "
          f"sum-if-all-segsum {total['segsum']:.3f} ms")


if __name__ == "__main__":
    main()
