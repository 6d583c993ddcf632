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


def _fft4_kernel(zr_ref, zi_ref, c1h_ref, c1l_ref, s1h_ref, s1l_ref,
                 twr_ref, twi_ref, c2h_ref, c2l_ref, s2h_ref, s2l_ref,
                 xr_ref, xi_ref, *, t_tile: int):
    C1h, C1l = c1h_ref[:], c1l_ref[:]
    S1h, S1l = s1h_ref[:], s1l_ref[:]
    TWr, TWi = twr_ref[:], twi_ref[:]
    C2h, C2l = c2h_ref[:], c2l_ref[:]
    S2h, S2l = s2h_ref[:], s2l_ref[:]
    for t in range(t_tile):                     # static unroll
        xrh, xrl = _split(zr_ref[t])            # (n1, n2)
        xih, xil = _split(zi_ref[t])
        # step 1: A = (C1 − i·S1) @ x, contraction over n1
        Ar = _d3(C1h, C1l, xrh, xrl) + _d3(S1h, S1l, xih, xil)
        Ai = _d3(C1h, C1l, xih, xil) - _d3(S1h, S1l, xrh, xrl)
        # step 2: twiddle (k1, n2), elementwise in VMEM
        Br = Ar * TWr + Ai * TWi
        Bi = Ai * TWr - Ar * TWi
        # step 3: X = B @ (C2 − i·S2), contraction over n2
        Brh, Brl = _split(Br)
        Bih, Bil = _split(Bi)
        xr_ref[t] = _d3(Brh, Brl, C2h, C2l) + _d3(Bih, Bil, S2h, S2l)
        xi_ref[t] = _d3(Bih, Bil, C2h, C2l) - _d3(Brh, Brl, S2h, S2l)


@functools.partial(jax.jit, static_argnames=("t_tile",))
def fft4_steps123(zr: jnp.ndarray, zi: jnp.ndarray,
                  t_tile: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Four-step FFT steps 1–3 of z = zr + i·zi, fused in one kernel.

    zr, zi: (B, n1, n2) float32 (row-major n = N2·n1 + n2 frame layout).
    Returns X[k1, k2] real/imag, each (B, n1, n2) — the caller applies
    the step-4 reindex (same contract as the XLA path's pre-transpose
    result in emspec.dsp.fourstep.fft_fourstep).
    """
    from emspec.dsp.fourstep import _tables

    b, n1, n2 = zr.shape
    n = n1 * n2
    C1, S1, TWr, TWi, C2, S2 = _tables(n)
    # pre-split tables to bf16 pairs on host (exact: hi+lo == f32 value)
    def pair(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32)
              - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)
    c1h, c1l = pair(C1)
    s1h, s1l = pair(S1)
    c2h, c2l = pair(C2.astype(np.float32))
    s2h, s2l = pair(S2.astype(np.float32))
    twr = jnp.asarray(TWr)
    twi = jnp.asarray(TWi)

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
    )(zr, zi, c1h, c1l, s1h, s1l, twr, twi, c2h, c2l, s2h, s2l)
    return xr[:b], xi[:b]


def supported(n1: int, n2: int) -> bool:
    """MXU-shaped factorizations only: small n1 starves the M dimension
    and the XLA path already wins there (BENCH.md policy)."""
    return n1 >= 64 and n2 >= 128
