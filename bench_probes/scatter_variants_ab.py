"""A/B of two multires-scatter variants at the default geometry.

Variant 1 — fused fold: `_scatter_pallas` folds the relative histogram
with P sequential ``out.at[slice].add`` passes (each a full read-modify-
write of the (t, rows) output, ~P·3·t·rows·4 bytes of traffic).  The
variant zero-pads the histogram once along t and sums P static slices
in ONE fused XLA elementwise kernel (each hist element read once, out
written once).

Variant 2 — factored outer-product scatter for the tiny-m long bank
(8192: m=43, S=33k puts it far beyond the one-hot-GEMM crossover, so it
rides segment_sum today).  The joint (δ, row) one-hot factors into
one-hot(δ)·contrib (t, m, P) ⊗ one-hot(row) (t, m, rows); the histogram
is one batched dot_general contracting m — dense, MXU-shaped, no
data-dependent scatter.  Split-hi/lo bf16 on the contrib side keeps the
established ≤2⁻¹⁶-class precision (the row one-hot is exact in bf16).

Run: python -m bench_probes.scatter_variants_ab [--quick]
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


def fold_at_add(hist, t_count, rows, R):
    """Current production fold (copy of _scatter_pallas epilogue)."""
    P = 2 * R + 1
    hist = hist.reshape(hist.shape[:-1] + (P, rows))
    hist = jnp.moveaxis(hist, -3, 0)
    out = jnp.zeros((t_count,) + hist.shape[1:-2] + (rows,), jnp.float32)
    for j in range(P):
        dlt = j - R
        seg = hist[..., j, :]
        span = t_count - abs(dlt)
        if span <= 0:
            continue
        if dlt >= 0:
            out = out.at[dlt:dlt + span].add(seg[:span])
        else:
            out = out.at[:span].add(seg[-dlt:-dlt + span])
    return out


def fold_padded_sum(hist, t_count, rows, R):
    """One fused kernel: pad t by R on both sides, sum P static slices."""
    P = 2 * R + 1
    hist = hist.reshape(hist.shape[:-1] + (P, rows))
    hist = jnp.moveaxis(hist, -3, 0)                  # (t, ..., P, rows)
    pad = [(R, R)] + [(0, 0)] * (hist.ndim - 1)
    hp = jnp.pad(hist, pad)                           # (t+2R, ..., P, rows)
    # out[u] = Σ_j hist[u - (j - R), j]  →  slice hp at offset R - dlt
    terms = [hp[2 * R - j:2 * R - j + t_count, ..., j, :] for j in range(P)]
    return sum(terms)


def scatter_outer(row, delta, contrib, t_count, rows, R):
    """Factored outer-product histogram for a small-m bank."""
    P = 2 * R + 1
    pr = jnp.arange(P, dtype=jnp.int32)
    rr = jnp.arange(rows, dtype=jnp.int32)
    a = jnp.where(delta[..., None] + R == pr, contrib[..., None], 0.0)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b = (row[..., None] == rr).astype(jnp.bfloat16)   # exact in bf16
    h = (jnp.einsum("tmp,tmr->tpr", a_hi, b,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("tmp,tmr->tpr", a_lo, b,
                      preferred_element_type=jnp.float32))
    return fold_padded_sum(h.reshape(t_count, P * rows), t_count, rows, R)


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

    from emspec.dsp.pallas.scatter import histogram_matmul

    for row, delta, contrib, n in zip(rows_l, delta_l, contrib_l,
                                      pipe.sizes):
        R_b = int(np.round(n / (2.0 * pipe.hop)))
        P = 2 * R_b + 1
        S = P * pipe.rows
        m = row.shape[-1]
        print(f"bank {n}: m={m} R={R_b} S={S}")

        if S <= 16384:
            ids = (delta + R_b) * pipe.rows + row

            def f_prod(c, ids=ids, S=S, R_b=R_b):
                h = histogram_matmul(ids, c, S, passes=2)
                return fold_at_add(h, t_count, pipe.rows, R_b)

            def f_fused(c, ids=ids, S=S, R_b=R_b):
                h = histogram_matmul(ids, c, S, passes=2)
                return fold_padded_sum(h, t_count, pipe.rows, R_b)

            # parity first (identical adds, just reassociated per cell —
            # each output cell sums the same ≤P values in a new order)
            want = np.asarray(jax.jit(f_prod)(contrib))
            got = np.asarray(jax.jit(f_fused)(contrib))
            rel = np.abs(got - want).max() / max(want.max(), 1e-30)
            print(f"  fold parity rel-to-peak {rel:.2e}")
            tp = time_of(f_prod, contrib)
            tf = time_of(f_fused, contrib)
            print(f"  at-add fold {tp:.3f} ms   padded-sum fold {tf:.3f} ms"
                  f"   ({tp / max(tf, 1e-9):.2f}x)")
        else:
            def f_seg(c, row=row, delta=delta):
                return pipe._scatter_segment_sum(row, delta, c, t_count, ())

            def f_outer(c, row=row, delta=delta, R_b=R_b):
                return scatter_outer(row, delta, c, t_count, pipe.rows, R_b)

            want = np.asarray(jax.jit(f_seg)(contrib))
            got = np.asarray(jax.jit(f_outer)(contrib))
            rel = np.abs(got - want).max() / max(want.max(), 1e-30)
            print(f"  outer-product parity rel-to-peak {rel:.2e}")
            ts = time_of(f_seg, contrib)
            to = time_of(f_outer, contrib)
            print(f"  segment_sum {ts:.3f} ms   outer-product {to:.3f} ms"
                  f"   ({ts / max(to, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
