"""Pallas TPU kernel: fused four-step FFT (steps 1–3 resident in VMEM).

The XLA four-step implementation (emspec/dsp/fourstep.py) materializes
every intermediate — step-1 products, twiddled B, step-3 products — in
HBM (~10 arrays of 180 MB at the 16ch/32768 stress shape).  This kernel
keeps the whole per-frame pipeline in VMEM: one (n1, n2) frame tile is
read once, two GEMM stages + the twiddle run against VMEM-resident DFT
tables, and only the final spectrum is written back.  HBM traffic drops
to inputs + outputs.

MXU precision: the tables are cos/sin values (not bf16-exact), so both
GEMM operands are split into bf16 (hi, lo) pairs and each product runs
as three single-pass bf16 GEMMs (hi·hi + hi·lo + lo·hi) — the same
error class as ``jax.lax.Precision.HIGH``, which measures *identical*
max error to HIGHEST for this algorithm (the decomposition's own float32
rounding dominates; BENCH.md round 2).

The kernel computes steps 1–3; the cheap step-4 reindex
(k = k1 + n1·k2 transpose+reshape) stays in XLA where it fuses with the
Hermitian unpack that follows.
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


def _split(v):
    """f32 → (bf16 hi, bf16 lo) with v ≈ hi + lo."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _d3(ah, al, bh, bl):
    """3-pass bf16-split product of a ≈ ah+al and b ≈ bh+bl (f32 acc)."""
    f32 = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f32)
            + jnp.dot(ah, bl, preferred_element_type=f32)
            + jnp.dot(al, bh, preferred_element_type=f32))


def _fft4_frame(zr_t, zi_t, tables):
    """One frame's four-step steps 1–3 in VMEM: (n1, n2) complex in →
    X[k1, k2] with k = k1 + n1·k2 (pre-step-4 order)."""
    (C1h, C1l, S1h, S1l, TWr, TWi, C2h, C2l, S2h, S2l) = tables
    xrh, xrl = _split(zr_t)
    xih, xil = _split(zi_t)
    # step 1: A = (C1 − i·S1) @ x, contraction over n1
    Ar = _d3(C1h, C1l, xrh, xrl) + _d3(S1h, S1l, xih, xil)
    Ai = _d3(C1h, C1l, xih, xil) - _d3(S1h, S1l, xrh, xrl)
    # step 2: twiddle (k1, n2), elementwise in VMEM
    Br = Ar * TWr + Ai * TWi
    Bi = Ai * TWr - Ar * TWi
    # step 3: X = B @ (C2 − i·S2), contraction over n2
    Brh, Brl = _split(Br)
    Bih, Bil = _split(Bi)
    Xr = _d3(Brh, Brl, C2h, C2l) + _d3(Bih, Bil, S2h, S2l)
    Xi = _d3(Bih, Bil, C2h, C2l) - _d3(Brh, Brl, S2h, S2l)
    return Xr, Xi


def _fft4_frame_real(x_t, tables):
    """One REAL frame's four-step steps 1–3 in VMEM (zi = 0: step 1
    halves to two split-products).  → full-range X[k1, k2]."""
    (C1h, C1l, S1h, S1l, TWr, TWi, C2h, C2l, S2h, S2l) = tables
    xh, xl = _split(x_t)
    Ar = _d3(C1h, C1l, xh, xl)
    Ai = -_d3(S1h, S1l, xh, xl)
    Br = Ar * TWr + Ai * TWi
    Bi = Ai * TWr - Ar * TWi
    Brh, Brl = _split(Br)
    Bih, Bil = _split(Bi)
    Xr = _d3(Brh, Brl, C2h, C2l) + _d3(Bih, Bil, S2h, S2l)
    Xi = _d3(Bih, Bil, C2h, C2l) - _d3(Brh, Brl, S2h, S2l)
    return Xr, Xi


def _fft4_frame_real_half(x_t, tables):
    """One REAL frame's steps 1–3 computing only k2 ∈ [0, n2/2] — the
    Hermitian-live half of the kept block plus the Nyquist-tile column.

    For n2 ≥ 256 the full-range step 3 spends half its MXU passes on
    k2 > n2/2 lane tiles whose bins are all Hermitian duplicates the
    deposit quantizer masks anyway.  Slicing C2/S2 to (n2, n2/2) keeps
    step 3 on exactly the output lane tiles that matter; the single
    k2 = n2/2 edge column (Nyquist lives there) is one f32
    multiply+lane-reduce on the otherwise-idle VPU — *more* accurate
    than the 3-pass split it replaces.  → X[k1, k2] for k2 ≤ n2/2,
    shape (n1, n2/2 + 1)."""
    (C1h, C1l, S1h, S1l, TWr, TWi,
     C2h, C2l, S2h, S2l, c2e, s2e) = tables
    xh, xl = _split(x_t)
    Ar = _d3(C1h, C1l, xh, xl)
    Ai = -_d3(S1h, S1l, xh, xl)
    Br = Ar * TWr + Ai * TWi
    Bi = Ai * TWr - Ar * TWi
    Brh, Brl = _split(Br)
    Bih, Bil = _split(Bi)
    Xr = _d3(Brh, Brl, C2h, C2l) + _d3(Bih, Bil, S2h, S2l)
    Xi = _d3(Bih, Bil, C2h, C2l) - _d3(Brh, Brl, S2h, S2l)
    # edge column k2 = n2/2: X[:, e] = Σ_j B[:, j]·(C2 − i·S2)[j, e]
    xr_e = jnp.sum(Br * c2e + Bi * s2e, axis=1, keepdims=True)
    xi_e = jnp.sum(Bi * c2e - Br * s2e, axis=1, keepdims=True)
    return (jnp.concatenate([Xr, xr_e], 1),
            jnp.concatenate([Xi, xi_e], 1))


def _fft4_kernel(zr_ref, zi_ref, c1h_ref, c1l_ref, s1h_ref, s1l_ref,
                 twr_ref, twi_ref, c2h_ref, c2l_ref, s2h_ref, s2l_ref,
                 xr_ref, xi_ref, *, t_tile: int):
    tables = (c1h_ref[:], c1l_ref[:], s1h_ref[:], s1l_ref[:],
              twr_ref[:], twi_ref[:], c2h_ref[:], c2l_ref[:],
              s2h_ref[:], s2l_ref[:])
    for t in range(t_tile):                     # static unroll
        xr_ref[t], xi_ref[t] = _fft4_frame(zr_ref[t], zi_ref[t], tables)


@functools.partial(jax.jit, static_argnames=("t_tile",))
def fft4_steps123(zr: jnp.ndarray, zi: jnp.ndarray,
                  t_tile: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Four-step FFT steps 1–3 of z = zr + i·zi, fused in one kernel.

    zr, zi: (B, n1, n2) float32 (row-major n = N2·n1 + n2 frame layout).
    Returns X[k1, k2] real/imag, each (B, n1, n2) — the caller applies
    the step-4 reindex (same contract as the XLA path's pre-transpose
    result in emspec.dsp.fourstep.fft_fourstep).
    """
    b, n1, n2 = zr.shape
    n = n1 * n2
    tables = _host_tables(n)
    tt = min(t_tile, b)
    b_pad = -(-b // tt) * tt
    if b_pad != b:
        zr = jnp.pad(zr, ((0, b_pad - b), (0, 0), (0, 0)))
        zi = jnp.pad(zi, ((0, b_pad - b), (0, 0), (0, 0)))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((tt, n1, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tables_bytes = 2 * (n1 * n1 * 2 * 2 + n2 * n2 * 2 * 2) + 2 * n1 * n2 * 4
    # io blocks are double-buffered and the unrolled loop keeps several
    # (n1, n2) temporaries live — size generously, it's a hard cap
    vmem_limit = (8 * tt * n1 * n2 * 4 + tables_bytes
                  + 24 * n1 * n2 * 4 + (4 << 20))
    xr, xi = pl.pallas_call(
        functools.partial(_fft4_kernel, t_tile=tt),
        grid=(b_pad // tt,),
        in_specs=[frame, frame,
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n2)), const((n1, n2)),
                  const((n2, n2)), const((n2, n2)),
                  const((n2, n2)), const((n2, n2))],
        out_specs=[frame, frame],
        out_shape=[jax.ShapeDtypeStruct((b_pad, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, n1, n2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * 3 * 4 * n * (n1 + n2),
            bytes_accessed=b_pad * n1 * n2 * 4 * 4,
            transcendentals=0,
        ),
    )(zr, zi, *tables)
    return xr[:b], xi[:b]


def supported(n1: int, n2: int) -> bool:
    """MXU-shaped factorizations only: small n1 starves the M dimension
    and the XLA path already wins there (BENCH.md policy).

    n2 ≥ 128 is MEASURED, not assumed: the (128, 64) alternative at
    8192 (step 1 at full K = 128 depth, lanes 64-wide) is 1.9× slower
    on the deposits kernel — the half-empty lane tiles cost every
    downstream stage more than step 1's contraction depth buys
    (BENCH.md item 48, parity-gated A/B/A)."""
    return n1 >= 64 and n2 >= 128


# ---------------------------------------------------------------------------
# Fused analysis kernel: FFT → Hermitian unpack → stencil → reassignment
# corrections → quantized deposits, one VMEM pass per frame.
# ---------------------------------------------------------------------------

def _host_tables(n: int):
    """DFT tables as (bf16 hi, bf16 lo) pairs + f32 twiddles (host).
    hi+lo carries ~16 of the 24 mantissa bits; together with the 3-pass
    split-dot this gives Precision.HIGH-class accuracy (measured equal
    to HIGHEST for the four-step algorithm, BENCH.md), not exactness."""
    from emspec.dsp.fourstep import _tables

    C1, S1, TWr, TWi, C2, S2 = _tables(n)

    def pair(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32)
              - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)

    c1h, c1l = pair(C1)
    s1h, s1l = pair(S1)
    c2h, c2l = pair(C2)
    s2h, s2l = pair(S2)
    return (c1h, c1l, s1h, s1l, jnp.asarray(TWr), jnp.asarray(TWi),
            c2h, c2l, s2h, s2l)


def _host_tables_half(n: int):
    """Tables for the half-spectrum deposit path (n2 ≥ 256): step-3
    cos/sin sliced to k2 < n2/2 (the only live output lane tiles) plus
    the k2 = n2/2 edge column as f32 rows for the VPU dot."""
    from emspec.dsp.fourstep import _tables

    C1, S1, TWr, TWi, C2, S2 = _tables(n)
    n2 = C2.shape[0]
    n2h = n2 // 2

    def pair(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32)
              - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)

    c1h, c1l = pair(C1)
    s1h, s1l = pair(S1)
    c2h, c2l = pair(C2[:, :n2h])
    s2h, s2l = pair(S2[:, :n2h])
    c2e = jnp.asarray(C2[:, n2h].astype(np.float32).reshape(1, n2))
    s2e = jnp.asarray(S2[:, n2h].astype(np.float32).reshape(1, n2))
    return (c1h, c1l, s1h, s1l, jnp.asarray(TWr), jnp.asarray(TWi),
            c2h, c2l, s2h, s2l, c2e, s2e)


def _frame_quantized(fr, th, tables, *, n1: int, n2: int, hop: int,
                     sr: float, rows: int, half: bool,
                     logmap_a, logmap_b, power_floor, kg, k_valid):
    """One frame, entirely in VMEM: raw + t·h spectra via two real-input
    four-step chains, periodic-Hann stencils, Auger–Flandrin corrections,
    display-grid quantization → (row_c, delta, contrib) tiles, each
    (n1, n2/2+1) in (k1, k2)-major order.  Shared by the deposits and
    fused-histogram kernels (identical math — the quantization contract
    lives here exactly once for both)."""
    n = n1 * n2
    k2_keep = n2 // 2 + 1
    # two REAL-input transforms (raw and t·h·frames, the window
    # applied in VMEM from the resident table).  No complex packing:
    # Mosaic has no `rev` primitive, so the Hermitian unpack's
    # reflection is unavailable in-kernel — and with full-range real
    # spectra there is nothing to unpack (A(N−k) = conj(A(k)) holds
    # identically; neighbors are plain wrapped shifts).  Costs +50%
    # MXU dots vs the packed transform, buys back the whole
    # unpack+stencil+corrections HBM round-trip.
    if half:
        # half-spectrum chains: k2 ∈ [0, n2/2] only (n1, k2_keep)
        Ar, Ai = _fft4_frame_real_half(fr, tables)
        Br, Bi = _fft4_frame_real_half(fr * th, tables)
        # neighbors A((k∓1) mod N) on the half block: interior
        # shifts are identical to the full-range case; the two
        # seam elements that used to be literal reads from the
        # discarded half come from Hermitian conjugation instead —
        # A(N−1) = conj(A(1)) for the k = 0 predecessor, and
        # A(n1·n2/2 + n1) = conj(A(N − that)) for the successor of
        # the (k1 = n1−1, k2 = n2/2) corner (a masked duplicate
        # bin; kept finite and faithful).  Same tolerance class as
        # the engine's own table rounding (see docstring).
        # (Mosaic rejects concats of slices taken from different
        # sublane offsets, so each wrap row is a same-row roll with
        # the seam element patched in via scalar extract + lane mask.)
        k2w = Ar.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k2w), 1)
        def prev_k_pair(Mr, Mi):
            rr = jnp.concatenate([Mr[-1:, -1:], Mr[-1:, :-1]], 1)
            ri = jnp.concatenate([Mi[-1:, -1:], Mi[-1:, :-1]], 1)
            wr = jnp.where(lane == 0, Mr[1, 0], rr)
            wi = jnp.where(lane == 0, -Mi[1, 0], ri)
            return (jnp.concatenate([wr, Mr[:-1, :]], 0),
                    jnp.concatenate([wi, Mi[:-1, :]], 0))
        def next_k_pair(Mr, Mi):
            rr = jnp.concatenate([Mr[:1, 1:], Mr[:1, :1]], 1)
            ri = jnp.concatenate([Mi[:1, 1:], Mi[:1, :1]], 1)
            wr = jnp.where(lane == k2w - 1, Mr[0, k2w - 2], rr)
            wi = jnp.where(lane == k2w - 1, -Mi[0, k2w - 2], ri)
            return (jnp.concatenate([Mr[1:, :], wr], 0),
                    jnp.concatenate([Mi[1:, :], wi], 0))
        Am1r, Am1i = prev_k_pair(Ar, Ai)
        Ap1r, Ap1i = next_k_pair(Ar, Ai)
    else:
        Ar, Ai = _fft4_frame_real(fr, tables)          # raw spectrum
        Br, Bi = _fft4_frame_real(fr * th, tables)     # t·h spectrum
        # neighbors A((k∓1) mod N) — shifts along k1 with a k2 carry row
        def prev_k(M):
            wrap = jnp.concatenate([M[-1:, -1:], M[-1:, :-1]], 1)
            return jnp.concatenate([wrap, M[:-1, :]], 0)
        def next_k(M):
            wrap = jnp.concatenate([M[:1, 1:], M[:1, :1]], 1)
            return jnp.concatenate([M[1:, :], wrap], 0)
        Am1r, Am1i = prev_k(Ar), prev_k(Ai)
        Ap1r, Ap1i = next_k(Ar), next_k(Ai)
    # periodic-Hann stencils (DESIGN.md §3)
    Xhr = 0.5 * Ar - 0.25 * (Am1r + Ap1r)
    Xhi = 0.5 * Ai - 0.25 * (Am1i + Ap1i)
    c = jnp.float32(0.5 * np.pi / n)       # X_dh = (−iπ/2n)(Am1 − Ap1)
    Xdr = c * (Am1i - Ap1i)
    Xdi = -c * (Am1r - Ap1r)
    # Auger–Flandrin corrections (emspec.dsp.reassign)
    power = Xhr * Xhr + Xhi * Xhi
    inv = 1.0 / jnp.maximum(power, 1e-30)
    dt = (Br * Xhr + Bi * Xhi) * inv
    dw = -(Xdi * Xhr - Xdr * Xhi) * inv
    # display-grid quantization (pipeline._deposits contract)
    power = power[:, :k2_keep]
    dt = dt[:, :k2_keep]
    dw = dw[:, :k2_keep]
    f_hat = (kg + dw * jnp.float32(n / (2.0 * np.pi))) * jnp.float32(sr / n)
    # same expression as pipeline._deposits / the oracle: round(Δt/hop)
    # as a DIVISION — a reciprocal-multiply differs by an ulp near
    # half-hop ties for non-power-of-two hops (quantization contract,
    # CLAUDE.md invariants)
    delta = jnp.round(dt / jnp.float32(hop)).astype(jnp.int32)
    row_f = (jnp.log2(jnp.maximum(f_hat, 1e-6)) - logmap_a) * logmap_b
    row = jnp.round(row_f).astype(jnp.int32)
    valid = ((power > power_floor)
             & (row >= 0) & (row < rows)
             & (f_hat > 0)
             & (jnp.abs(dt) <= jnp.float32(n) * 0.5)
             & k_valid)
    row_c = jnp.clip(row, 0, rows - 1)
    contrib = jnp.where(
        valid, power * jnp.float32(1.0 / (float(n) * float(n))), 0.0)
    return row_c, delta, contrib


def _iota_grids(n1: int, n2: int):
    """Static (k1, k2_keep) index grids: true bin index k = k1 + n1·k2
    (integer iota — Mosaic's tpu.iota has no float flavor), and the
    valid-bin mask (bins beyond N/2 inside the kept block are the
    k2 == n2/2, k1 > 0 Hermitian duplicates)."""
    k2_keep = n2 // 2 + 1
    k1g = jax.lax.broadcasted_iota(jnp.int32, (n1, k2_keep), 0)
    k2g = jax.lax.broadcasted_iota(jnp.int32, (n1, k2_keep), 1)
    kg = (k1g + n1 * k2g).astype(jnp.float32)
    k_valid = kg <= float((n1 * n2) // 2)
    return kg, k_valid


def _deposits_kernel(scal_ref, zr_ref, th_ref, *refs,
                     t_tile: int, n1: int, n2: int, hop: int, sr: float,
                     rows: int, half: bool, reach: int | None):
    """Per frame: _frame_quantized in VMEM, deposits written to HBM.
    Output order is (k1, k2)-major: the scatter is a histogram, so
    deposit order is irrelevant — no step-4 reindex/transpose ever
    touches HBM.

    Hermitian edges need no special cases: with the FULL k = 0..N−1
    spectrum resident, A((k±1) mod N) exists literally and equals the
    conj-reflected value the sliced formulation (stencil_from_raw)
    special-cases — up to the engine's own table rounding (A(N−k) and
    conj(A(k)) come from different cos/sin entries), which sits inside
    the fourstep tolerance contract the tests pin.
    """
    n_tables = 12 if half else 10
    tables = tuple(r[:] for r in refs[:n_tables])
    if reach is None:
        row_ref, delta_ref, contrib_ref = refs[n_tables:]
    else:
        ids_ref, contrib_ref = refs[n_tables:]
    kg, k_valid = _iota_grids(n1, n2)
    th = th_ref[:]

    for t in range(t_tile):
        row_c, delta, contrib = _frame_quantized(
            zr_ref[t], th, tables, n1=n1, n2=n2, hop=hop, sr=sr,
            rows=rows, half=half, logmap_a=scal_ref[0],
            logmap_b=scal_ref[1], power_floor=scal_ref[2],
            kg=kg, k_valid=k_valid)
        if reach is None:
            row_ref[t] = row_c
            delta_ref[t] = delta
        else:
            # fused id packing for the relative-histogram scatter:
            # id = (δ + R)·rows + row — saves the XLA glue pass over
            # every deposit (and one of the scatter's two input reads).
            # Out-of-range δ lands outside [0, P·rows) and the scatter
            # drops it, same as the unfused contract.
            ids_ref[t] = (delta + jnp.int32(reach)) * jnp.int32(rows) + row_c
        contrib_ref[t] = contrib


@functools.partial(jax.jit, static_argnames=("n", "hop", "sr", "rows",
                                             "t_tile", "reach"))
def fft4_deposits(frames: jnp.ndarray,
                  logmap_a, logmap_b, power_floor, *,
                  n: int, hop: int, sr: float, rows: int,
                  t_tile: int = 8, reach: int | None = None):
    """Fused single-bank enhanced analysis: frames → (row, delta, contrib).

    frames: (B, n) float32 — the t·h windowing happens in VMEM from a
    resident table.  Returns int32 rows and column deltas plus float32
    contributions, each (B, n1·(n2/2+1)) in (k1, k2)-major order — a
    permutation of the bins that the histogram scatter is invariant to.
    Deposits at k > N/2 (the n1−1 Hermitian duplicates in the kept
    block) carry zero contribution.

    With ``reach`` set, the id packing for the relative-histogram
    scatter fuses into the kernel epilogue and the return is
    ``(ids, contrib)`` with ``ids = (δ + reach)·rows + row`` — the
    histogram_matmul input, with no XLA pass over the deposits between
    the two kernels.

    Matches pipeline._deposits' unfused quantization contract; the
    fourstep domain's tolerance rules apply (DESIGN.md §5, ulp-level on
    TPU, verified by tests).
    """
    from emspec.dsp.fourstep import _FACTORS
    from emspec.dsp.windows import time_weighted_hann

    n1, n2 = _FACTORS[n]
    k2_keep = n2 // 2 + 1
    b = frames.shape[0]
    tt = min(t_tile, b)
    b_pad = -(-b // tt) * tt
    zr = frames.reshape(b, n1, n2)
    if b_pad != b:
        zr = jnp.pad(zr, ((0, b_pad - b), (0, 0), (0, 0)))
    th = jnp.asarray(time_weighted_hann(n, np.float32)).reshape(n1, n2)
    scal = jnp.stack([jnp.float32(logmap_a), jnp.float32(logmap_b),
                      jnp.float32(power_floor)])
    # half-spectrum step 3 saves a full output lane tile only when the
    # discarded k2 > n2/2 half spans whole 128-lane tiles
    half = n2 >= 256
    n2h = n2 // 2
    tables = _host_tables_half(n) if half else _host_tables(n)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    frame_in = pl.BlockSpec((tt, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    frame_out = pl.BlockSpec((tt, n1, k2_keep), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    step3_specs = ([const((n2, n2h)), const((n2, n2h)),
                    const((n2, n2h)), const((n2, n2h)),
                    const((1, n2)), const((1, n2))] if half else
                   [const((n2, n2)), const((n2, n2)),
                    const((n2, n2)), const((n2, n2))])
    vmem_limit = (8 * tt * n1 * n2 * 4
                  + 2 * (n1 * n1 * 2 * 2 + n2 * n2 * 2 * 2) + 2 * n1 * n2 * 4
                  + 40 * n1 * n2 * 4 + (4 << 20))
    n_out = 2 if reach is not None else 3
    outs = pl.pallas_call(
        functools.partial(_deposits_kernel, t_tile=tt, n1=n1, n2=n2,
                          hop=hop, sr=sr, rows=rows, half=half,
                          reach=reach),
        grid=(b_pad // tt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  frame_in, const((n1, n2)),
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n2)), const((n1, n2))] + step3_specs,
        out_specs=[frame_out] * n_out,
        out_shape=([jax.ShapeDtypeStruct((b_pad, n1, k2_keep), jnp.int32)]
                   * (n_out - 1)
                   + [jax.ShapeDtypeStruct((b_pad, n1, k2_keep), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * 3 * 4 * n1 * n2 * (n1 + n2),
            bytes_accessed=b_pad * n1 * n2 * 4 * 5,
            transcendentals=b_pad * n1 * k2_keep,
        ),
    )(scal, zr, th, *tables)
    flat = (b_pad, n1 * k2_keep)
    return tuple(o.reshape(flat)[:b] for o in outs)


# ---------------------------------------------------------------------------
# Fully fused kernel: analysis + reassignment SCATTER in one VMEM pass —
# the deposits (ids, contrib) never exist in HBM (round-2 VERDICT item 1:
# the scatter's 0.29 ms ids round trip + the A build were the measured
# headroom at the stress shape; BENCH.md item 19).
# ---------------------------------------------------------------------------

def _tile_hist(ids, contrib, *, s_hi: int, passes: int, row_chunk: int):
    """Histogram of one (n1, K2) deposits tile WITHOUT the lane→sublane
    relayout — the blocker that kept the scatter a separate kernel.

    The standalone scatter kernel (scatter.py) wants every id on the
    LANE axis: its one-hots are sublane-broadcasts of a (1, m) row, and
    deposits arriving as 2-D (n1, k2) spectra tiles would need the
    (n1, k2)→lanes flatten (a relayout measured at 1.8× the whole kernel
    when the orientation went the wrong way; BENCH.md item 14).

    Here each SUBLANE-slice ids[r, :] is already a lane-resident (1, K2)
    row — the exact shape the proven builds take — so the one-hots per
    row are the standalone kernel's sublane-broadcast + compare:

        A_r[h, l] = v_l·[hi_l == h]    (passes·s_hi, K2)
        O_r[o, l] = [lo_l == o]        (128, K2)

    ``row_chunk`` rows' blocks then lane-concatenate into one
    (·, row_chunk·K2) pair, and the lanes-lanes ``dot_general``
    (contract dim 1 of both — scatter.py item 14's orientation) absorbs
    the chunk in ONE MXU contraction.  A lane-broadcast dual of this
    (m on sublanes, contract dim 0) was measured 6.5× SLOWER at the
    8192 shape — minor-dim broadcasts of sublane columns are the
    expensive VPU direction; negative result recorded in BENCH.md.
    bf16 value splitting follows the scatter kernel's contract exactly
    (2 passes ⇒ ≤2⁻¹⁶ relative, non-negative summands)."""
    n1, k2k = ids.shape
    # Main body: the first k2k−1 columns (always a multiple of 64, and of
    # 128 on the half-spectrum sizes) — lane-concat offsets stay tile-
    # aligned, so the chunk assembly is copies, not shift chains.  The
    # dropped edge column k2 = n2/2 holds exactly ONE valid deposit (the
    # true Nyquist bin needs k = k1 + n1·n2/2 ≤ N/2 ⇒ k1 = 0; every
    # other row is k_valid-masked to zero contribution) — it rejoins via
    # an exact f32 scalar one-hot below, skipping the bf16 split.
    k2c = k2k - 1
    sub_lo = jax.lax.broadcasted_iota(jnp.int32, (_HIST_LO, k2c), 0)
    sub_hi = jax.lax.broadcasted_iota(jnp.int32, (s_hi, k2c), 0)
    acc = jnp.zeros((passes * s_hi, _HIST_LO), jnp.float32)
    for c in range(0, n1, row_chunk):
        blocks_a, blocks_o = [], []
        for r in range(c, min(c + row_chunk, n1)):
            idr = jax.lax.slice(ids, (r, 0), (r + 1, k2c))      # (1, K2c)
            vr = jax.lax.slice(contrib, (r, 0), (r + 1, k2c))
            hi = jnp.right_shift(idr, 7)
            lo = jnp.bitwise_and(idr, _HIST_LO - 1)
            # zero the VALUE of out-of-range ids (id < 0 ⇒ nothing,
            # NaN/Inf-safe — same contract as histogram_matmul)
            vr = jnp.where((hi >= 0) & (hi < s_hi), vr, 0.0)
            # f32 select first: Mosaic can't relayout an i1 compare mask
            # straight into 16-bit tiling (scatter.py lesson)
            ot = (jnp.broadcast_to(lo, (_HIST_LO, k2c)) == sub_lo
                  ).astype(jnp.float32).astype(jnp.bfloat16)
            hm = (jnp.broadcast_to(hi, (s_hi, k2c)) == sub_hi
                  ).astype(jnp.float32).astype(jnp.bfloat16)
            parts = []
            resid = vr
            for _ in range(passes):
                v = resid.astype(jnp.bfloat16)
                resid = resid - v.astype(jnp.float32)
                parts.append(hm * jnp.broadcast_to(v, (s_hi, k2c)))
            blocks_a.append(parts[0] if passes == 1
                            else jnp.concatenate(parts, 0))
            blocks_o.append(ot)
        a_cat = blocks_a[0] if len(blocks_a) == 1 else jnp.concatenate(blocks_a, 1)
        o_cat = blocks_o[0] if len(blocks_o) == 1 else jnp.concatenate(blocks_o, 1)
        acc = acc + jax.lax.dot_general(
            a_cat, o_cat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    h = acc[:s_hi]
    for p in range(1, passes):
        h = h + acc[p * s_hi:(p + 1) * s_hi]
    # Nyquist fixup: the one live edge-column deposit, exact f32
    id0 = ids[0, k2c]
    v0 = contrib[0, k2c]
    hi0 = jnp.right_shift(id0, 7)
    lo0 = jnp.bitwise_and(id0, _HIST_LO - 1)
    oh = ((jax.lax.broadcasted_iota(jnp.int32, (s_hi, _HIST_LO), 0) == hi0)
          & (jax.lax.broadcasted_iota(jnp.int32, (s_hi, _HIST_LO), 1) == lo0))
    return h + jnp.where(oh, v0, 0.0)


_HIST_LO = 128     # lo-digit radix — lane width, same as scatter.py


def _hist_kernel(scal_ref, zr_ref, th_ref, *refs,
                 t_tile: int, n1: int, n2: int, hop: int, sr: float,
                 rows: int, half: bool, reach: int, s_hi: int,
                 s_hi_pad: int, passes: int, row_chunk: int):
    """_frame_quantized → in-VMEM column scatter → per-frame relative
    histogram (s_hi_pad, 128).  ``scal_ref[3]`` is the streaming
    negative-column mask threshold: contributions with
    id < min_id are dropped (batch passes −2³⁰ ⇒ keep everything)."""
    n_tables = 12 if half else 10
    tables = tuple(r[:] for r in refs[:n_tables])
    out_ref = refs[n_tables]
    kg, k_valid = _iota_grids(n1, n2)
    th = th_ref[:]
    min_id = scal_ref[3].astype(jnp.int32)

    for t in range(t_tile):
        row_c, delta, contrib = _frame_quantized(
            zr_ref[t], th, tables, n1=n1, n2=n2, hop=hop, sr=sr,
            rows=rows, half=half, logmap_a=scal_ref[0],
            logmap_b=scal_ref[1], power_floor=scal_ref[2],
            kg=kg, k_valid=k_valid)
        ids = (delta + jnp.int32(reach)) * jnp.int32(rows) + row_c
        # streaming mask: t + δ ≥ 0 ⟺ id ≥ (R − t)·rows (row < rows
        # makes these exactly equivalent — pipeline._stream_step)
        contrib = jnp.where(ids >= min_id, contrib, 0.0)
        h = _tile_hist(ids, contrib, s_hi=s_hi, passes=passes,
                       row_chunk=row_chunk)
        if s_hi_pad != s_hi:
            h = jnp.concatenate(
                [h, jnp.zeros((s_hi_pad - s_hi, _HIST_LO), jnp.float32)], 0)
        out_ref[t] = h


@functools.partial(jax.jit, static_argnames=("n", "hop", "sr", "rows",
                                             "reach", "passes", "t_tile",
                                             "row_chunk"))
def fft4_hist(frames: jnp.ndarray,
              logmap_a, logmap_b, power_floor, min_id, *,
              n: int, hop: int, sr: float, rows: int, reach: int,
              passes: int = 2, t_tile: int = 2, row_chunk: int = 8):
    """Fully fused single-bank enhanced analysis + scatter: frames →
    per-frame RELATIVE histograms, deposits never leaving VMEM.

    frames: (B, n) float32 → (B, (2·reach+1)·rows) float32, bin
    (δ + reach)·rows + row — exactly
    ``histogram_matmul(*fft4_deposits(..., reach=R), P·rows)`` with the
    ids/contrib HBM round trip, the standalone scatter kernel launch,
    and its A/O builds replaced by an in-register column scatter (see
    _tile_hist — the sublane-contraction that sidesteps the relayout).

    min_id: dynamic streaming mask — contributions with packed id <
    min_id are dropped (pass (R−t)·rows from the stream step;
    batch callers pass −2³⁰ to keep everything).  f32-exact for every
    value this pipeline can produce (|min_id| ≤ P·rows < 2²⁴).

    Accumulation order differs from histogram_matmul (per-column chunks
    instead of m-chunks), so parity is tolerance-level (≤2⁻¹⁶ relative,
    same bf16-split error class) — the CPU bit-exact pin stays on the
    unfused paths.
    """
    from emspec.dsp.fourstep import _FACTORS
    from emspec.dsp.windows import time_weighted_hann

    n1, n2 = _FACTORS[n]
    k2_keep = n2 // 2 + 1
    num_bins = (2 * reach + 1) * rows
    s_hi = -(-num_bins // _HIST_LO)
    s_hi_pad = -(-s_hi // 8) * 8                   # f32 sublane tile
    b = frames.shape[0]
    tt = min(t_tile, b)
    b_pad = -(-b // tt) * tt
    zr = frames.reshape(b, n1, n2)
    if b_pad != b:
        zr = jnp.pad(zr, ((0, b_pad - b), (0, 0), (0, 0)))
    th = jnp.asarray(time_weighted_hann(n, np.float32)).reshape(n1, n2)
    scal = jnp.stack([jnp.float32(logmap_a), jnp.float32(logmap_b),
                      jnp.float32(power_floor),
                      jnp.asarray(min_id, jnp.float32)])
    half = n2 >= 256
    n2h = n2 // 2
    tables = _host_tables_half(n) if half else _host_tables(n)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    frame_in = pl.BlockSpec((tt, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    hist_out = pl.BlockSpec((tt, s_hi_pad, _HIST_LO), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    step3_specs = ([const((n2, n2h)), const((n2, n2h)),
                    const((n2, n2h)), const((n2, n2h)),
                    const((1, n2)), const((1, n2))] if half else
                   [const((n2, n2)), const((n2, n2)),
                    const((n2, n2)), const((n2, n2))])
    vmem_limit = (8 * tt * n1 * n2 * 4
                  + 2 * (n1 * n1 * 2 * 2 + n2 * n2 * 2 * 2) + 2 * n1 * n2 * 4
                  + 80 * n1 * n2 * 4
                  + 8 * row_chunk * k2_keep * (_HIST_LO + 2 * passes * s_hi)
                  + 8 * s_hi_pad * _HIST_LO + (8 << 20))
    out = pl.pallas_call(
        functools.partial(_hist_kernel, t_tile=tt, n1=n1, n2=n2,
                          hop=hop, sr=sr, rows=rows, half=half,
                          reach=reach, s_hi=s_hi, s_hi_pad=s_hi_pad,
                          passes=passes, row_chunk=row_chunk),
        grid=(b_pad // tt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  frame_in, const((n1, n2)),
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n2)), const((n1, n2))] + step3_specs,
        out_specs=hist_out,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_hi_pad, _HIST_LO),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b_pad * 3 * 4 * n1 * n2 * (n1 + n2)
                   + 2 * b_pad * n1 * k2_keep * (passes * s_hi + _HIST_LO)),
            bytes_accessed=b_pad * (n1 * n2 + s_hi_pad * _HIST_LO) * 4,
            transcendentals=b_pad * n1 * k2_keep,
        ),
    )(scal, zr, th, *tables)
    return out.reshape(b_pad, s_hi_pad * _HIST_LO)[:b, :num_bins]
