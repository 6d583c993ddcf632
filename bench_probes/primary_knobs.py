"""Knob sweep for the primary-8192 hot kernels (round-3 VERDICT #1,
follow-up to bench_probes/primary_ablation.py).

The ablation measured both kernels at ~50% of bf16 peak — one
efficiency class below the stress kernels' ~70%.  At 8192 the only
MXU-shaped factorization is (64, 128) (fft4.supported: n1 ≥ 64,
n2 ≥ 128), so the remaining levers are launch knobs, swept here at the
EXACT pinned shape (t=372, m=4160, S=2560):

* fft4_deposits t_tile ∈ {8, 16, 32}: more frames per grid step
  amortize the resident DFT tables and deepen the MXU pipeline;
* histogram_matmul row_block ∈ {2, 4, 8} × m_chunk ∈ {default, 4224}:
  at m=4160 (33 K-tiles vs the stress shape's 129) per-row overheads
  amortize 4× less, so the measured-best stress knobs need not be
  measured-best here.

Run from /root/repo (TPU backend): python -m bench_probes.primary_knobs
"""

import jax
import jax.numpy as jnp
import numpy as np

from emspec.bench.harness import _signal
from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.config import Settings
from emspec.pipeline import Pipeline

SECONDS = 16.0


def scan_ms(fn, *args, k=8):
    step = probe_chain(fn, *args)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (step(cc), None), c, None, length=k)[0])
    return chain_marginal_ms(f, lambda: jnp.float32(0.0), k)


def main():
    s = Settings(mode="enhanced", multires=False, fft_size=8192)
    pipe = Pipeline(s)
    n = s.fft_size
    x = _signal(SECONDS, s.sample_rate, 1)
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    xd = jax.device_put(x)
    R = pipe.reach
    S = (2 * R + 1) * pipe.rows

    # the exact frames the fused kernel consumes in production
    frames = jax.jit(lambda x: pipe._bank_inputs(x, t_count)[0]
                     .reshape(-1, n))(xd)
    frames = jax.device_put(np.asarray(frames))
    print(f"frames {frames.shape}  t={t_count}  S={S}  rows={pipe.rows}",
          flush=True)

    from emspec.dsp.pallas.fft4 import fft4_deposits

    for t_tile in (8, 16, 32):
        try:
            fn = jax.jit(lambda fr, tt=t_tile: fft4_deposits(
                fr, p.logmap_a, p.logmap_b, p.power_floor, n=n,
                hop=pipe.hop, sr=float(s.sample_rate), rows=pipe.rows,
                reach=R, t_tile=tt))
            ms = scan_ms(fn, frames, k=8)
            print(f"deposits t_tile={t_tile}: {ms:.4f} ms/call", flush=True)
        except Exception as e:
            print(f"deposits t_tile={t_tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # scatter knobs at the real (ids, contrib)
    ids, contrib = jax.jit(
        lambda x: pipe._deposit_ids_rel(pipe._bank_inputs(x, t_count), p))(xd)
    ids = jax.device_put(np.asarray(ids))
    contrib = jax.device_put(np.asarray(contrib))
    from emspec.dsp.pallas.scatter import histogram_matmul

    for row_block in (2, 4, 8):
        for m_chunk in (None, 4224):
            try:
                ms = scan_ms(
                    lambda c, rb=row_block, mc=m_chunk: histogram_matmul(
                        ids, c, S, m_chunk=mc, row_block=rb),
                    contrib, k=8)
                print(f"scatter row_block={row_block} m_chunk={m_chunk}: "
                      f"{ms:.4f} ms/call", flush=True)
            except Exception as e:
                print(f"scatter row_block={row_block} m_chunk={m_chunk}: "
                      f"FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
