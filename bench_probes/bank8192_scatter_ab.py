"""Bank-8192 scatter formulation A/B (round-4 follow-up to
bench_probes/multires_hbm.py).

The binding-axis probe found the multires 8192 bank's segment_sum at
0.424 ms = 42× its 6.6 MB traffic floor — XLA lowers the scatter-add
serially (~6.8 ns × 62k updates).  Three replacement formulations, all
on the bank's REAL deposits (m=43, t=1437, R=32, rows=512):

  segsum      — production baseline (serialized XLA scatter)
  pallas_rel  — the relative-histogram MXU kernel at R=32 (S=33280;
                the crossover currently excludes it — floor model says
                the (t, P·rows) materialization costs ≥0.59 ms, verify)
  sort_seg    — sort deposits by absolute cell id, segment-reduce via
                cumsum-and-diff, scatter the per-segment sums with
                unique indices (everything vectorizable except one
                unique-scatter of ≤62k cells)

Run from /root/repo (TPU backend): python -m bench_probes.bank8192_scatter_ab
"""

import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.config import Settings
from emspec.io import synth
from emspec.pipeline import Pipeline

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
    i8 = pipe.sizes.index(8192)
    row = jax.device_put(np.asarray(banked[0][i8]))
    delta = jax.device_put(np.asarray(banked[1][i8]))
    contrib = jax.device_put(np.asarray(banked[2][i8]))
    m = row.shape[-1]
    R = int(np.round(8192 / (2.0 * pipe.hop)))
    print(f"bank 8192: m={m} t={t} R={R} rows={rows}", flush=True)

    # -- baseline -----------------------------------------------------------
    ms = scan_ms(lambda c: pipe._scatter_segment_sum(row, delta, c, t, ()),
                 contrib, k=8)
    print(f"segsum     {ms:.4f} ms/call", flush=True)

    # -- relative-histogram pallas at R=32 ------------------------------------
    ids_rel = jax.device_put(np.asarray((delta + R) * rows + row))
    try:
        ms = scan_ms(lambda c: pipe._scatter_pallas(ids_rel, c, t, R=R),
                     contrib, k=8)
        print(f"pallas_rel {ms:.4f} ms/call", flush=True)
    except Exception as e:
        print(f"pallas_rel FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # -- sort + unique-scatter ------------------------------------------------
    def sort_seg(c, row=row, delta=delta):
        t_idx = jnp.arange(t, dtype=jnp.int32)[:, None]
        col = t_idx + delta
        ids = jnp.where((col >= 0) & (col < t), col * rows + row,
                        t * rows)                    # dump cell at the end
        flat_ids = ids.reshape(-1)
        flat_c = c.reshape(-1)
        order = jnp.argsort(flat_ids)
        sid = flat_ids[order]
        sc = flat_c[order]
        csum = jnp.cumsum(sc)
        # segment end = last position of each id run; segment sum =
        # csum[end] - csum[end of previous run]
        is_end = jnp.concatenate([sid[1:] != sid[:-1],
                                  jnp.ones((1,), bool)])
        prev = jnp.concatenate([jnp.zeros((1,), csum.dtype),
                                jnp.where(is_end, csum, 0.0)[:-1]])
        # carry forward the previous end's csum with a max-scan
        prev_end = jax.lax.associative_scan(jnp.maximum, prev)
        seg_sum = jnp.where(is_end, csum - prev_end, 0.0)
        out = jnp.zeros((t * rows + 1,), jnp.float32)
        out = out.at[sid].add(jnp.where(is_end, seg_sum, 0.0),
                              indices_are_sorted=True)
        return out[:t * rows].reshape(t, rows)

    try:
        ms = scan_ms(sort_seg, contrib, k=8)
        print(f"sort_seg   {ms:.4f} ms/call", flush=True)
        # parity sanity vs baseline
        a = np.asarray(jax.jit(sort_seg)(contrib))
        b = np.asarray(jax.jit(
            lambda c: pipe._scatter_segment_sum(row, delta, c, t, ()))(
                contrib))
        print(f"sort_seg parity max|Δ| = {np.abs(a - b).max():.3e}",
              flush=True)
    except Exception as e:
        print(f"sort_seg   FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
