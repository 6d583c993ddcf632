"""Multires binding-axis probe (round-3 VERDICT #2).

The model puts multires at 2.8% of bf16 peak — damning on the wrong
axis: the mixed per-bank scatter is traffic-, not FLOP-, dominated.
This probe decides whether the scatter stage is at ITS roof (the HBM
axis) or leaves a real lever:

for each bank (8192/2048/512 at the default display geometry), time the
production backend on the bank's REAL deposits, account its HBM bytes
(deposit reads + relative/segment grid read-modify-write), and report
the implied GB/s against the chip's measured-achievable ~650-684 GB/s
(BENCH.md items 19/31 io floors) and the 819 GB/s datasheet roof.

Run from /root/repo (TPU backend): python -m bench_probes.multires_hbm
"""

import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.config import Settings
from emspec.io import synth
from emspec.pipeline import Pipeline

ACHIEVABLE_GBS = 684.0      # measured io floor class on this chip
SECONDS = 4.0


def scan_ms(fn, *args, k=8):
    step = probe_chain(fn, *args)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (step(cc), None), c, None, length=k)[0])
    return chain_marginal_ms(f, lambda: jnp.float32(0.0), k)


def main():
    print("backend:", jax.default_backend(), flush=True)
    s = Settings(mode="enhanced", multires=True)
    pipe = Pipeline(s)
    rng = np.random.default_rng(7)
    x = (synth.chirp(30.0, 20000.0, SECONDS, sample_rate=s.sample_rate)
         + synth.multitone([55.0, 220.0, 880.0, 3520.0], SECONDS,
                           sample_rate=s.sample_rate, amplitude=0.3)
         + 0.05 * rng.standard_normal(
             int(SECONDS * s.sample_rate)).astype(np.float32))
    xd = jax.device_put(np.asarray(x, np.float32))
    t = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    rows = pipe.rows

    banked = jax.jit(
        lambda xx: pipe._deposits_banked(pipe._bank_inputs(xx, t), p))(xd)
    rows_l, delta_l, contrib_l = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), banked)

    from emspec.pipeline import PALLAS_SCATTER_MAX_S

    total_ms = 0.0
    total_bytes = 0.0
    for i, n in enumerate(pipe.sizes):
        row, delta, contrib = rows_l[i], delta_l[i], contrib_l[i]
        m = row.shape[-1]
        R_b = int(np.round(n / (2.0 * pipe.hop)))     # _scatter_mixed's R_b
        P = 2 * R_b + 1
        S_b = P * rows
        if S_b <= PALLAS_SCATTER_MAX_S:
            ids = jax.device_put(np.asarray((delta + R_b) * rows + row))
            ms = scan_ms(lambda c, ids=ids, R_b=R_b:
                         pipe._scatter_pallas(ids, c, t, R=R_b),
                         contrib, k=8)
            # ids+contrib read, hist written + re-read by the fold, out
            by = 8 * m * t + 8 * t * S_b + 4 * t * rows
            backend = "pallas"
        else:
            ms = scan_ms(lambda c, row=row, delta=delta:
                         pipe._scatter_segment_sum(row, delta, c, t, ()),
                         contrib, k=8)
            # 3 deposit arrays read + one grid RMW — a LOWER bound on
            # XLA's scatter lowering traffic
            by = 12 * m * t + 8 * t * rows
            backend = "segsum"
        gbs = by / (ms / 1e3) / 1e9
        total_ms += ms
        total_bytes += by
        print(f"bank {n:5d}: m={m:6d} R={R_b:3d} S={S_b:6d} {backend:7s} "
              f"{ms:7.3f} ms  {by/1e6:7.1f} MB  -> {gbs:6.1f} GB/s "
              f"({100*gbs/ACHIEVABLE_GBS:5.1f}% of achievable)", flush=True)

    print(f"scatter total {total_ms:.3f} ms, {total_bytes/1e6:.1f} MB, "
          f"{total_bytes/(total_ms/1e3)/1e9:.1f} GB/s aggregate", flush=True)

    # the production composed stage for comparison (mixed path exactly)
    ms_mixed = scan_ms(
        lambda xx: pipe._enhanced_power(xx, t, p), xd, k=8)
    dep_ms = scan_ms(
        lambda xx: pipe._deposits_banked(pipe._bank_inputs(xx, t), p),
        xd, k=8)
    print(f"enhanced_power (deposits+scatter composed): {ms_mixed:.3f} ms; "
          f"deposits alone: {dep_ms:.3f} ms; "
          f"implied scatter-in-context: {ms_mixed - dep_ms:.3f} ms "
          f"(t={t})", flush=True)


if __name__ == "__main__":
    main()
