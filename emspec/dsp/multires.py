"""Multi-resolution low-end analysis + log-frequency merge (L2, config 2).

Reference evidence: README.md:10 "Enhanced Low-End Response" and the
"Low End Boost 3.9x" slider in assets/settings.png; the north star pins
the exact bank set: "parallel 8192/2048/512-pt STFTs merged into one
log-frequency raster" [NS configs[2]].

Design (SURVEY.md §2.2):

* All banks share one hop (samples) and are **center-aligned**: with
  ``N_max`` the largest bank, bank *b*'s frame *t* covers
  ``[(N_max-N_b)//2 + t·hop, … + N_b)`` so every bank's column *t*
  represents the same instant ``t·hop + N_max/2``.  Frame count is set
  by the largest bank.
* Each bank covers a frequency band — low gets the 8192-pt window's
  5.9 Hz resolution, highs keep the 512-pt window's 10.7 ms time
  resolution — with raised-cosine crossfades (in log2 frequency, ±½
  octave around each crossover) forming a partition of unity [INF:
  only merge consistent with the NS wording].
* The merge onto the log-frequency display axis is a precomputed sparse
  gather + lerp per row: ``out[r] = Σ_b band_w[b,r] · (w0[b,r]·S_b[i0[b,r]]
  + w1[b,r]·S_b[i0[b,r]+1])`` — three gathers and FMAs per column, fully
  fused by XLA.  Tables are host-precomputed numpy (they depend only on
  continuous params ``freq_scale``/band edges, so a slider move rebuilds
  ~KBs of tables and never recompiles).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def log_freq_axis(rows: int, f_min: float, f_max: float, zoom: float = 1.0) -> np.ndarray:
    """Display-row center frequencies, log-spaced bottom→top.

    ``zoom`` is the reference's "Freq Scale" slider (README.md:48): >1
    narrows the view toward the low end by 1/zoom of the log span [INF].
    """
    lo, hi = np.log2(f_min), np.log2(f_max)
    hi_z = lo + (hi - lo) / max(zoom, 1e-3)
    return np.exp2(np.linspace(lo, hi_z, rows))


def band_weights(row_freqs: np.ndarray, sizes: tuple, crossover_low: float,
                 crossover_high: float, fade_octaves: float = 0.5) -> np.ndarray:
    """(num_banks, rows) partition-of-unity band weights.

    Banks are ordered largest-FFT-first (low band first), matching
    ``Settings.multires_sizes``.  Raised-cosine fades in log2 frequency.
    """
    def lowpass(f, edge):  # 1 below edge, 0 above, cosine fade over ±fade/2 oct
        x = np.log2(np.maximum(f, 1e-9) / edge) / fade_octaves  # -.5 .. .5 fade
        x = np.clip(x + 0.5, 0.0, 1.0)
        return 0.5 * (1.0 + np.cos(np.pi * x))

    edges = [crossover_low, crossover_high]
    n_banks = len(sizes)
    w = np.zeros((n_banks, len(row_freqs)))
    prev_low = np.ones(len(row_freqs))
    for b in range(n_banks):
        if b < n_banks - 1 and b < len(edges):
            lp = lowpass(row_freqs, edges[b])
        else:
            lp = np.zeros(len(row_freqs)) if b < n_banks - 1 else None
        if b == n_banks - 1:
            w[b] = prev_low
        else:
            w[b] = prev_low * lp
            prev_low = prev_low * (1.0 - lp)
    return w


class MergeTables(NamedTuple):
    """Precomputed per-bank gather/lerp tables (host numpy → device const)."""
    row_freqs: np.ndarray          # (rows,)
    i0: tuple                      # per bank: (rows,) int32 lower bin index
    w0: tuple                      # per bank: (rows,) float32 lower bin weight
    band_w: tuple                  # per bank: (rows,) float32 band weight


def build_merge_tables(sizes: tuple, sample_rate: int, rows: int,
                       f_min: float, freq_scale: float,
                       crossover_low: float, crossover_high: float) -> MergeTables:
    row_freqs = log_freq_axis(rows, f_min, sample_rate / 2.0, freq_scale)
    bw = band_weights(row_freqs, sizes, crossover_low, crossover_high)
    i0s, w0s = [], []
    for n in sizes:
        bin_hz = sample_rate / n
        pos = row_freqs / bin_hz                 # fractional bin per row
        k_count = n // 2 + 1
        # clip BEFORE the int cast: an extreme (finite) zoom can push
        # pos past int32, and float→int of such values is an invalid
        # cast (RuntimeWarning + platform-defined result); the clipped
        # value is identical for every in-range pos
        i0 = np.floor(np.clip(pos, 0, k_count - 2)).astype(np.int32)
        frac = np.clip(pos - i0, 0.0, 1.0)
        i0s.append(i0)
        w0s.append((1.0 - frac).astype(np.float32))
    return MergeTables(
        row_freqs=row_freqs,
        i0=tuple(i0s),
        w0=tuple(w0s),
        band_w=tuple(w.astype(np.float32) for w in bw),
    )


def bank_offsets(sizes: tuple) -> tuple:
    """Per-bank start offset that center-aligns all banks' frames."""
    n_max = max(sizes)
    return tuple((n_max - n) // 2 for n in sizes)


def band_support_hz(bank: int, n_banks: int, crossover_low: float,
                    crossover_high: float, nyquist: float,
                    fade_octaves: float = 0.5) -> tuple[float, float]:
    """[lo, hi] Hz outside which bank ``bank``'s weight is exactly zero.

    The raised-cosine fade spans ±fade/2 octaves around each crossover, so
    the analytic support has hard edges — the pipeline slices each bank's
    spectrum to this range and skips ~90% of the scatter deposits (the
    out-of-band bins carry weight 0 and would deposit nothing)."""
    edges = [crossover_low, crossover_high]
    half = 2.0 ** (fade_octaves / 2.0)
    lo = 0.0 if bank == 0 else edges[bank - 1] / half
    hi = nyquist if bank == n_banks - 1 else edges[bank] * half
    return lo, hi


def band_weight_at(freqs_hz: np.ndarray, bank: int, n_banks: int,
                   crossover_low: float, crossover_high: float,
                   fade_octaves: float = 0.5) -> np.ndarray:
    """Bank ``bank``'s weight evaluated *analytically* at arbitrary
    frequencies (the same partition of unity as :func:`band_weights`,
    which evaluates it on the display rows)."""
    return band_weights(freqs_hz, tuple(range(n_banks)) if n_banks else (),
                        crossover_low, crossover_high, fade_octaves)[bank]


def merge_columns(bank_specs: tuple, tables: MergeTables) -> jnp.ndarray:
    """Merge per-bank spectra (..., K_b) → one log-f raster column (..., rows).

    ``bank_specs[b]`` is the linear power spectrum of bank *b* (any number
    of leading batch/time axes).  Per-unit-bandwidth normalization: each
    bank's power is scaled by its bin count so a stationary tone carries
    the same displayed power regardless of which bank renders it (Hann
    coherent gain is N/2 in amplitude → N²/4 in power, so dividing by N²
    equalizes tone response across banks; the residual 1/4 is absorbed by
    the Gain slider).
    """
    acc = None
    for S, i0, w0, bw in zip(bank_specs, tables.i0, tables.w0, tables.band_w):
        n = (S.shape[-1] - 1) * 2
        i0_a = jnp.asarray(i0)
        w0_a = jnp.asarray(w0)
        lerp = S[..., i0_a] * w0_a + S[..., i0_a + 1] * (1.0 - w0_a)
        contrib = lerp * jnp.asarray(bw) * (1.0 / float(n * n))
        acc = contrib if acc is None else acc + contrib
    return acc
