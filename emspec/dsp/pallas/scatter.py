"""Pallas TPU kernel: histogram (the reassignment scatter-add) as an MXU
outer-product GEMM — the hottest op of the pipeline (SURVEY.md §3.2: the
one op XLA won't fuse well; §7 hard part 1).

Data-dependent scatters don't vectorize on TPU's VPU; the TPU-native
formulation is a *histogram as matmul*.  Round 1 built the one-hot matrix
``O[m, s] = [i_m == s]`` over the full scatter space S and contracted
``v @ O`` as an M=1 vector-matrix product — correct, but doubly wasteful:
the VPU builds ``m·S`` comparisons per call and the MXU runs with one of
its 128 sublane rows occupied (measured VPU-bound at ~2.3 TFLOP/s
equivalent on the 16ch/32768 stress shape).

Round 2 replaces it with a **digit decomposition**: split every id into
``id = hi·128 + lo`` and observe that the histogram *is* the rank-2
contraction

    H[hi, lo] = Σ_m  v_m · [hi_m == hi] · [lo_m == lo]
              = (A @ O)[hi, lo],   A[h, m] = v_m·[hi_m == h],
                                   O[m, l] = [lo_m == l]

so one (S_hi, m) @ (m, 128) GEMM per batch row produces the whole
histogram, reshaped.  Costs vs round 1 on the stress shape (S = 4608,
S_hi = 36): VPU one-hot build drops 4608 → 164 compares per deposit
(28×), MXU pass count drops 36× (the N dimension is one 128-lane tile and
the sublane rows are the hi digits, not a single broadcast row).
Measured numbers live in BENCH.md (honest fetch-forced marginal timing).

The one-hot tiles never exist in HBM — the kernel streams (ids, vals)
chunks through VMEM and keeps the (S_hi, 128) accumulator resident, so
HBM traffic is the inputs once and the output once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emspec.dsp.pallas import check_jax_compat

check_jax_compat()   # warn once on Mosaic/jax version drift (pin in __init__)

_LO = 128            # lane width: the low digit's radix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hist_kernel(ids_ref, vals_ref, out_ref, *, s_hi: int, passes: int,
                 row_block: int):
    """One (row-block, m-chunk) step: accumulate the chunk's histogram
    for ``row_block`` batch rows (unrolled — fewer grid steps amortize
    per-step overhead, measured −17% at the stress shape with 4 rows).

    A[h, m] = v_m·[hi_m == h] and Oᵀ[l, m] = [lo_m == l] are built on the
    VPU in VMEM; their lanes-against-lanes contraction on the MXU is this
    chunk's histogram, accumulated in place across the m grid dim.

    Both one-hots keep m on the LANE axis — the deposits' native layout.
    The first version of this kernel built O as (MC, 128), which needs
    the (1, MC) lo digits relaid out lane→sublane (``lo.reshape(mc, 1)``
    + minor-dim broadcast): measured 1.8× the whole kernel at the stress
    shape.  A ``dot_general`` contracting dim 1 of both operands keeps
    every build a sublane-broadcast + compare and lets the MXU handle
    the orientation."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    mc = ids_ref.shape[-1]
    # loop-invariant row-index grids (CSE would catch these, but hoisting
    # makes the reuse explicit)
    lrows = jax.lax.broadcasted_iota(jnp.int32, (_LO, mc), 0)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (s_hi, mc), 0)

    for g in range(row_block):
        ids = ids_ref[g]                              # (1, MC) int32
        vals = vals_ref[g]                            # (1, MC) f32
        hi = jnp.right_shift(ids, 7)                  # floor(id/128); -1 → -1
        lo = jnp.bitwise_and(ids, _LO - 1)
        # Zero the VALUE of out-of-range ids up front (one compare+select
        # on the (1, MC) row): the M-stacked build multiplies hm·v, and
        # 0·Inf/0·NaN would poison the whole row's histogram — the old
        # where-routing dropped such deposits silently, and the docstring
        # contract (id = -1 ⇒ contributes nothing) must survive non-finite
        # vals.
        vals = jnp.where((hi >= 0) & (hi < s_hi), vals, 0.0)
        # Oᵀ: (128, MC) — lo-digit one-hot; 0/1 is exactly representable in
        # bf16, so the MXU's native input type costs no accuracy here.
        # Select in f32 first: Mosaic can't relayout the (8,128)-tiled i1
        # mask of an int32 compare straight into 16-bit (16,128) tiling.
        Ot = (jnp.broadcast_to(lo, (_LO, mc)) == lrows
              ).astype(jnp.float32).astype(jnp.bfloat16)
        # hi-digit one-hot, also exact bf16 0/1, built ONCE and reused by
        # every bf16 pass (invalid ids have hi outside [0, S_hi) and land
        # nowhere).  The MXU multiplies in bf16; a plain f32 dot would
        # silently truncate vals to 8 mantissa bits (measured 4e-3
        # relative error on the real chip — caught by tests/test_tpu.py).
        # Splitting vals into ``passes`` bf16 terms bounds the error at
        # ~2^-8·passes relative (all contributions are non-negative
        # powers, so bin sums can't cancel): 2 passes ⇒ ≤ 2^-16 ≈ 1.5e-5,
        # 3 ⇒ f32-exact.
        hm = (hrows == jnp.broadcast_to(hi, (s_hi, mc))
              ).astype(jnp.float32).astype(jnp.bfloat16)
        # All passes' A terms stack on the M axis and contract in ONE
        # GEMM: A_p = hm·v_p is a single bf16 multiply (v_p is already
        # bf16-rounded, the 0/1 mask is exact, so the product is the
        # exact routed term), and the (passes·S_hi, MC) Acat doubles the
        # MXU's M-tile occupancy vs one 40-row GEMM per pass — measured
        # −30% on the whole kernel at the stress shape, bit-identical.
        parts = []
        resid = vals
        for _ in range(passes):
            v = resid.astype(jnp.bfloat16)
            resid = resid - v.astype(jnp.float32)
            parts.append(hm * jnp.broadcast_to(v, (s_hi, mc)))
        Acat = parts[0] if passes == 1 else jnp.concatenate(parts, axis=0)
        H = jax.lax.dot_general(Acat, Ot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = out_ref[g]
        for pi in range(passes):
            acc = acc + H[pi * s_hi:(pi + 1) * s_hi]
        out_ref[g] = acc


@functools.partial(jax.jit, static_argnames=("num_bins", "m_chunk", "passes",
                                             "row_block"))
def histogram_matmul(ids: jnp.ndarray, vals: jnp.ndarray, num_bins: int,
                     m_chunk: int | None = None,
                     passes: int = 2, row_block: int = 4) -> jnp.ndarray:
    """Scatter-add ``vals`` into ``num_bins`` cells keyed by ``ids``.

    ids:  (..., M) int32 in [0, num_bins) — out-of-range ids contribute
          nothing (their hi digit matches no accumulator row), so callers
          can encode "dropped" deposits as id = -1 instead of masking.
    vals: (..., M) float32
    →     (..., num_bins) float32

    Equivalent to ``jax.ops.segment_sum`` per leading element, but runs as
    one MXU GEMM per (batch row, chunk) with on-the-fly digit one-hots
    (no sort, no serialized scatter, no HBM materialization).

    passes: bf16 split terms for ``vals`` (the MXU multiplies in bf16).
    2 (default) bounds the histogram error at ≤ 2^-16 relative — an order
    below display significance and the validate/parity tolerances; 3 is
    f32-exact for callers that need it.  The segment_sum reference backend
    stays the bit-accurate baseline either way.

    row_block: batch rows processed per grid step (unrolled); measured
    −17% at the stress shape vs one row per step (per-step overheads
    amortize; 8 regresses under VMEM pressure).
    """
    lead = ids.shape[:-1]
    m = ids.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    ids2 = ids.reshape(b, m)
    vals2 = vals.reshape(b, m).astype(jnp.float32)

    s_hi = _round_up(_round_up(num_bins, _LO) // _LO, 8)   # f32 sublane tile
    if m_chunk is None:
        # auto: one chunk per batch row when the live per-row arrays (Oᵀ +
        # hm + the stacked Acat, bf16, plus f32 select temps) fit a ~20 MB
        # VMEM request (measured fastest at the stress shape — no grid
        # revisiting; Mosaic schedules the streaming).  When m exceeds the
        # budget, BALANCE the chunks — ceil-dividing m into equal
        # 128-multiples — instead of chopping at the budget edge: m_pad
        # rounds up to a chunk multiple, and a chunk just under m would
        # otherwise nearly double the padded work (measured −20% end to
        # end at the stress shape when this went wrong).
        per_m = 2 * (3 * _LO + (1 + passes) * s_hi)
        m_chunk = max((20 << 20) // per_m // 128 * 128, 512)
    if _round_up(m, 128) <= m_chunk:
        mc = _round_up(m, 128)
    else:
        n_chunks = -(-m // m_chunk)
        mc = _round_up(-(-m // n_chunks), 128)
    m_pad = _round_up(m, mc)
    if m_pad != m:
        # pad with id = -1 (contributes nothing)
        ids2 = jnp.pad(ids2, ((0, 0), (0, m_pad - m)), constant_values=-1)
        vals2 = jnp.pad(vals2, ((0, 0), (0, m_pad - m)))
    g = max(min(row_block, b), 1)
    b_pad = -(-b // g) * g
    if b_pad != b:
        ids2 = jnp.pad(ids2, ((0, b_pad - b), (0, 0)), constant_values=-1)
        vals2 = jnp.pad(vals2, ((0, b_pad - b), (0, 0)))
    # dim-1 middle axis: blocks of (g, 1, mc) are legal because the block's
    # second-to-last dim equals the array's
    ids3 = ids2.reshape(b_pad, 1, m_pad)
    vals3 = vals2.reshape(b_pad, 1, m_pad)

    grid = (b_pad // g, m_pad // mc)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, s_hi=s_hi, passes=passes,
                          row_block=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, 1, mc), lambda bi, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, mc), lambda bi, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s_hi, _LO), lambda bi, mi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_hi, _LO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(int(1.5 * mc * 2 * (3 * _LO + (1 + passes) * s_hi))
                              + 8 * g * (mc + s_hi * _LO) + (1 << 21)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * m_pad * s_hi * _LO,
            bytes_accessed=b_pad * (8 * m_pad + 4 * s_hi * _LO),
            transcendentals=0,
        ),
    )(ids3, vals3)
    return (out.reshape(b_pad, s_hi * _LO)[:b, :num_bins]
            .reshape(lead + (num_bins,)))


def histogram_reference(ids, vals, num_bins):
    """segment_sum formulation — the correctness baseline the kernel is
    parity-tested against (SURVEY.md §7 hard part 1: 'keep both')."""
    lead = ids.shape[:-1]

    def one(i, v):
        safe = jnp.where((i >= 0) & (i < num_bins), i, num_bins)
        masked = jnp.where((i >= 0) & (i < num_bins), v, 0.0)
        return jax.ops.segment_sum(masked, safe, num_segments=num_bins + 1)[:num_bins]

    if lead:
        b = int(np.prod(lead))
        out = jax.vmap(one)(ids.reshape(b, -1), vals.reshape(b, -1))
        return out.reshape(lead + (num_bins,))
    return one(ids.reshape(-1), vals.reshape(-1))
