"""Roofline / MFU accounting for the bench report (VERDICT round-1 #8).

Per display column, estimates the arithmetic (FLOPs) and HBM traffic
(bytes) of each pipeline stage from the structural configuration, so the
harness can report achieved TFLOP/s / GB/s and % of the chip's peak next
to columns/sec — making arithmetic-intensity regressions visible.

These are *model* numbers (documented formulas below), not counters: the
TPU exposes no per-op flop counters through this environment.  They are
deliberately conservative (real FFTs via the packed-complex stencil path
are counted as one complex FFT of length N).

v5e peaks used: 197 TFLOP/s bf16, ~49 TFLOP/s f32 (MXU), 819 GB/s HBM
(public TPU v5e datasheet figures).
"""

from __future__ import annotations

import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0
V5E_HBM_GBS = 819.0


def estimate_column_cost(pipe) -> dict:
    """FLOPs + HBM bytes per emitted display column for a Pipeline.

    Stage models (C = channels, per bank of size N with K = N/2+1 kept
    bins after band-support slicing):

    * framing/window:   N mul + N read + N write      (slice-concat copy)
    * FFT (stencil):    one complex N-FFT ≈ 5·N·log2(N) flops; stencil
                        recombination ≈ 12·K; bytes: N in, 3·K complex out
    * corrections:      ≈ 30 flops/bin (3 complex ratios + quantize)
    * scatter (pallas): 2·passes·m·S_hi·128 GEMM flops over m = ΣK
                        deposits into S = P·rows cells (bf16: 2 bytes/el)
    * scatter (segsum): counted as 8 flops/deposit + sort-free gather
                        traffic (XLA's lowering varies; traffic dominates)
    * merge (natural):  2 gathers + lerp per row per bank ≈ 6·rows
    * post chain:       ≈ 25 flops/row (dB log10 counted as 10)
    * LUT:              rows gather, 4 bytes/px out
    """
    s = pipe.settings
    C = max(s.channels, 1)
    rows = pipe.rows
    enhanced = s.mode == "enhanced"
    flops = 0.0
    bytes_ = 0.0

    m_total = 0
    for n, (k_lo, k_hi) in zip(pipe.sizes, pipe.k_slices):
        K = k_hi - k_lo
        m_total += K
        # framing + windowing (stencil packs 2 real frames into 1 complex)
        flops += C * 2 * n
        bytes_ += C * 4 * (2 * n)                       # frame in + windowed out
        # FFT: one complex N-point transform per frame (stencil method)
        flops += C * 5 * n * np.log2(n)
        bytes_ += C * 8 * (n + 3 * K)                   # complex in, X_h/th/dh out
        if enhanced:
            flops += C * (12 * K + 30 * K)              # stencils + corrections
            bytes_ += C * 4 * 2 * K                     # ids + contribs

    if enhanced:
        S = (2 * pipe.reach + 1) * rows
        if pipe.use_pallas_scatter:
            s_hi = -(-((S + 127) // 128) // 8) * 8      # ceil(S/128) → mult of 8
            flops += C * 2 * 2 * m_total * s_hi * 128   # 2 bf16 passes
            bytes_ += C * (8 * m_total + 4 * S)
        else:
            flops += C * 8 * m_total
            bytes_ += C * (8 * m_total + 4 * S) * 2     # XLA scatter r/w
    else:
        flops += C * 6 * rows * len(pipe.sizes)         # gather/lerp merge
        bytes_ += C * 4 * rows * len(pipe.sizes) * 3

    flops += C * 25 * rows                              # post chain
    bytes_ += C * (4 * rows * 3 + 4 * rows)             # post + RGBA out
    return {"flops_per_col": float(flops), "bytes_per_col": float(bytes_),
            "deposits_per_col": int(C * m_total)}


def roofline_report(pipe, cols_per_sec: float) -> dict:
    """Achieved rates + % of v5e peaks for a measured throughput."""
    est = estimate_column_cost(pipe)
    tflops = est["flops_per_col"] * cols_per_sec / 1e12
    gbs = est["bytes_per_col"] * cols_per_sec / 1e9
    return {
        "est_flops_per_col": round(est["flops_per_col"] / 1e6, 3),  # MFLOP
        "est_mb_per_col": round(est["bytes_per_col"] / 1e6, 4),
        "achieved_tflops": round(tflops, 3),
        "achieved_gbs": round(gbs, 2),
        "pct_v5e_bf16_peak": round(100 * tflops / V5E_BF16_TFLOPS, 2),
        "pct_v5e_f32_peak": round(100 * tflops / V5E_F32_TFLOPS, 2),
        "pct_v5e_hbm_peak": round(100 * gbs / V5E_HBM_GBS, 2),
        "arith_intensity_flops_per_byte": round(
            est["flops_per_col"] / max(est["bytes_per_col"], 1.0), 2),
    }
