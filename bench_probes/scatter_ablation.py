"""Where does the stress scatter's 1.5 ms sit AFTER the |Δt| ≤ N/2
tightening (S 4608 → 2560, s_hi 36 → 20)?

The round-2 ablation (BENCH.md item 19, S=4608) found: I/O floor
0.29 ms, GEMM the largest term, O build hidden under the MXU, A build
~0.9 ms exposed.  The tightening halved the A build and the GEMM's
M-occupancy (M = passes·s_hi = 40 of 128) without touching the O build
(m·128 compares, reach-independent) or the I/O — so the balance may have
flipped to the O build / I/O, which would explain why the measured
scatter stage barely moved (1.45 → 1.50 ms) when S halved.

Variant kernels stub one stage each (the stub stays value-dependent on
the chunk so Mosaic cannot hoist it across grid steps):

  full     — production kernel (baseline)
  no_o     — Oᵀ replaced by a build-free bf16 broadcast of vals
  no_a     — hi one-hot + pass split replaced by a broadcast of vals
  no_gemm  — dot_general replaced by a lane-slice add of the builds
  io_only  — reads the chunk, writes its sum (the streaming floor)

Run: python -m bench_probes.scatter_ablation
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emspec.bench.measure import chain_marginal_ms, probe_chain

_LO = 128


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(ids_ref, vals_ref, out_ref, *, s_hi, passes, row_block, variant):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    mc = ids_ref.shape[-1]
    lrows = jax.lax.broadcasted_iota(jnp.int32, (_LO, mc), 0)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (s_hi, mc), 0)

    for g in range(row_block):
        ids = ids_ref[g]
        vals = vals_ref[g]
        if variant == "io_only":
            out_ref[g] = out_ref[g] + (vals[0, 0] + ids[0, 0].astype(jnp.float32)) * 0.0 + 1.0
            continue
        hi = jnp.right_shift(ids, 7)
        lo = jnp.bitwise_and(ids, _LO - 1)
        vals = jnp.where((hi >= 0) & (hi < s_hi), vals, 0.0)
        if variant == "no_o":
            Ot = jnp.broadcast_to(vals.astype(jnp.bfloat16), (_LO, mc))
        else:
            Ot = (jnp.broadcast_to(lo, (_LO, mc)) == lrows
                  ).astype(jnp.float32).astype(jnp.bfloat16)
        if variant == "no_a":
            Acat = jnp.broadcast_to(vals.astype(jnp.bfloat16),
                                    (passes * s_hi, mc))
        else:
            hm = (hrows == jnp.broadcast_to(hi, (s_hi, mc))
                  ).astype(jnp.float32).astype(jnp.bfloat16)
            parts = []
            resid = vals
            for _ in range(passes):
                v = resid.astype(jnp.bfloat16)
                resid = resid - v.astype(jnp.float32)
                parts.append(hm * jnp.broadcast_to(v, (s_hi, mc)))
            Acat = parts[0] if passes == 1 else jnp.concatenate(parts, axis=0)
        if variant == "no_gemm":
            H = (Acat[:, :_LO].astype(jnp.float32)
                 + Ot[:1, :_LO].astype(jnp.float32))
        else:
            H = jax.lax.dot_general(Acat, Ot, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        acc = out_ref[g]
        for pi in range(passes):
            acc = acc + H[pi * s_hi:(pi + 1) * s_hi]
        out_ref[g] = acc


@functools.partial(jax.jit, static_argnames=("num_bins", "variant"))
def hist_variant(ids, vals, num_bins, variant):
    b, m = ids.shape
    passes, row_block = 2, 4
    s_hi = _round_up(_round_up(num_bins, _LO) // _LO, 8)
    per_m = 2 * (3 * _LO + (1 + passes) * s_hi)
    m_chunk = max((20 << 20) // per_m // 128 * 128, 512)
    if _round_up(m, 128) <= m_chunk:
        mc = _round_up(m, 128)
    else:
        n_chunks = -(-m // m_chunk)
        mc = _round_up(-(-m // n_chunks), 128)
    m_pad = _round_up(m, mc)
    if m_pad != m:
        ids = jnp.pad(ids, ((0, 0), (0, m_pad - m)), constant_values=-1)
        vals = jnp.pad(vals, ((0, 0), (0, m_pad - m)))
    g = row_block
    b_pad = -(-b // g) * g
    if b_pad != b:
        ids = jnp.pad(ids, ((0, b_pad - b), (0, 0)), constant_values=-1)
        vals = jnp.pad(vals, ((0, b_pad - b), (0, 0)))
    ids3 = ids.reshape(b_pad, 1, m_pad)
    vals3 = vals.reshape(b_pad, 1, m_pad)
    out = pl.pallas_call(
        functools.partial(_kernel, s_hi=s_hi, passes=passes,
                          row_block=g, variant=variant),
        grid=(b_pad // g, m_pad // mc),
        in_specs=[pl.BlockSpec((g, 1, mc), lambda bi, mi: (bi, 0, mi),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g, 1, mc), lambda bi, mi: (bi, 0, mi),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, s_hi, _LO), lambda bi, mi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_hi, _LO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(int(1.5 * mc * 2 * (3 * _LO + (1 + passes) * s_hi))
                              + 8 * g * (mc + s_hi * _LO) + (1 << 21))),
    )(ids3, vals3)
    return out.reshape(b_pad, s_hi * _LO)[:b, :num_bins]


def main():
    # new stress shape: b = 16 ch · 43 cols, m = n1·k2_keep, S = P·rows
    b, m, S = 688, 16512, 2560
    rng = np.random.default_rng(0)
    ids = rng.integers(0, S, size=(b, m)).astype(np.int32)
    ids[rng.random((b, m)) < 0.5] = -1          # realistic masked fraction
    vals = rng.random((b, m)).astype(np.float32)
    idd, vd = jax.device_put(ids), jax.device_put(vals)

    import jax as _jax
    for variant in ["full", "no_o", "no_a", "no_gemm", "io_only"]:
        fn = lambda v, idd=idd, variant=variant: hist_variant(
            idd, v, S, variant)
        k = 16
        step = probe_chain(fn, vd)
        f = _jax.jit(lambda c: _jax.lax.scan(
            lambda cc, _: (step(cc), None), c, None, length=k)[0])
        ms = chain_marginal_ms(f, lambda: jnp.float32(0.0), k)
        print(f"{variant:8s} {ms:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
