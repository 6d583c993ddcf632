"""Float64 numpy oracle — independent naive implementation of every stage.

Written once from the math in SURVEY.md §2.2 (Auger–Flandrin reassignment
operators, Fulop & Fitz) and the canonical post-chain order documented in
``emspec/post/chain.py``'s module docstring — deliberately *not* from the
JAX code (SURVEY.md §4.1).  Everything is float64, loops are allowed,
clarity beats speed.  All parity tests compare the float32 JAX pipeline
against this within per-stage tolerances.
"""

from __future__ import annotations

import numpy as np

DB_EPS = 1e-12
DB_FLOOR = -200.0
AGC_TARGET_DB = 0.0
AGC_DECAY = 0.99


# ---------------------------------------------------------------- windows
def windows(n: int):
    """(h, th, dh) in float64: periodic Hann, centered time-weighted Hann,
    analytic derivative dh/dn."""
    h = np.zeros(n)
    th = np.zeros(n)
    dh = np.zeros(n)
    for i in range(n):
        h[i] = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)
        th[i] = (i - n / 2.0) * h[i]
        dh[i] = (np.pi / n) * np.sin(2.0 * np.pi * i / n)
    return h, th, dh


# -----------------------------------------------------------------framing
def frames_of(x: np.ndarray, n: int, hop: int) -> np.ndarray:
    x = np.asarray(x, np.float64)
    t = 0 if len(x) < n else (len(x) - n) // hop + 1
    out = np.zeros((t, n))
    for i in range(t):
        out[i] = x[i * hop: i * hop + n]
    return out


# -------------------------------------------------------------------- stft
def stft(x: np.ndarray, n: int, hop: int, window: np.ndarray) -> np.ndarray:
    f = frames_of(x, n, hop)
    return np.fft.rfft(f * window[None, :], axis=-1)


def power_spectrogram(x: np.ndarray, n: int, hop: int) -> np.ndarray:
    h, _, _ = windows(n)
    X = stft(x, n, hop, h)
    p = np.abs(X) ** 2
    # natural-path non-finite scrub — mirrors Pipeline._bank_power: a
    # NaN/Inf input sample must black out its columns, never poison the
    # downstream AGC EMA (exact identity for finite inputs)
    return np.where(np.isfinite(p), p, 0.0)


# ------------------------------------------------------------- reassignment
def reassigned_spectrogram(
    x: np.ndarray, n: int, hop: int, power_floor: float = 1e-12
) -> np.ndarray:
    """Naive loop implementation of the reassignment scatter."""
    h, th, dh = windows(n)
    X_h = stft(x, n, hop, h)
    X_th = stft(x, n, hop, th)
    X_dh = stft(x, n, hop, dh)
    t_count, k_count = X_h.shape
    out = np.zeros((t_count, k_count))
    for t in range(t_count):
        for k in range(k_count):
            p = abs(X_h[t, k]) ** 2
            if p <= power_floor:
                continue
            cross_t = X_th[t, k] * np.conj(X_h[t, k])
            cross_d = X_dh[t, k] * np.conj(X_h[t, k])
            dt = cross_t.real / p          # samples from frame center
            dw = -cross_d.imag / p         # rad/sample
            if abs(dt) > n / 2.0:      # beyond the window support
                continue
            tb = t + int(np.round(dt / hop))   # relative rounding (see impl)
            f_hat = k + dw * n / (2.0 * np.pi)
            fb = int(round(f_hat))
            if 0 <= tb < t_count and 0 <= fb < k_count:
                out[tb, fb] += p
    return out


def corrections(x: np.ndarray, n: int, hop: int):
    """(power, dt_samples, dw_rad_per_sample) per (frame, bin) — for
    stage-level parity of the correction operators alone."""
    h, th, dh = windows(n)
    X_h = stft(x, n, hop, h)
    X_th = stft(x, n, hop, th)
    X_dh = stft(x, n, hop, dh)
    p = np.abs(X_h) ** 2
    safe = np.maximum(p, 1e-30)
    dt = (X_th * np.conj(X_h)).real / safe
    dw = -(X_dh * np.conj(X_h)).imag / safe
    return p, dt, dw


# -------------------------------------------------------------- post chain
def low_end_ramp(freqs_hz: np.ndarray, boost: float, cutoff_hz: float) -> np.ndarray:
    f = np.maximum(np.asarray(freqs_hz, np.float64), 1e-6)
    shape = np.clip(np.log2(cutoff_hz / f), 0.0, 1.0)
    return 1.0 + (boost - 1.0) * shape


def postprocess(
    power_tk: np.ndarray,         # (t, rows) linear power over time
    freqs_hz: np.ndarray,         # (rows,)
    gain: float, db_range: float, noise_gate_db: float,
    agc_strength: float, agc_enabled: bool,
    smoothing: float, brightness: float,
    low_end_boost: float, low_end_cutoff: float,
) -> np.ndarray:
    """Sequential (stateful) post chain over time, canonical order 1-8."""
    ramp = low_end_ramp(freqs_hz, low_end_boost, low_end_cutoff)
    t_count, rows = power_tk.shape
    out = np.zeros((t_count, rows))
    smooth = np.zeros(rows)
    agc_ref = AGC_TARGET_DB
    for t in range(t_count):
        p = power_tk[t] * ramp * gain                      # 1-2
        v = 10.0 * np.log10(p + DB_EPS)                    # 3
        peak = np.max(v)
        agc_ref = AGC_DECAY * agc_ref + (1.0 - AGC_DECAY) * peak
        if agc_enabled:
            v = v + agc_strength * (AGC_TARGET_DB - agc_ref)   # 4
        v = np.where(v < noise_gate_db, DB_FLOOR, v)       # 5
        vis = np.clip((v - (AGC_TARGET_DB - db_range)) / db_range, 0.0, 1.0)  # 6
        smooth = smoothing * smooth + (1.0 - smoothing) * vis  # 7
        out[t] = np.clip(smooth * (2.0 * brightness), 0.0, 1.0)  # 8
    return out


# ---------------------------------------------------------- log-freq merge
def log_freq_axis(rows: int, f_min: float, f_max: float, zoom: float = 1.0) -> np.ndarray:
    """Row-center frequencies: log-spaced f_min→f_max; ``zoom`` (Freq Scale)
    narrows the span toward f_min by 1/zoom of the log range."""
    lo, hi = np.log2(f_min), np.log2(f_max)
    hi_z = lo + (hi - lo) / max(zoom, 1e-3)
    return 2.0 ** np.linspace(lo, hi_z, rows)


def interp_to_rows(spec_k: np.ndarray, bin_freqs: np.ndarray, row_freqs: np.ndarray) -> np.ndarray:
    """Linear interpolation of one spectrum onto the display rows."""
    return np.interp(row_freqs, bin_freqs, spec_k)


def band_weights(row_freqs, sizes, crossover_low, crossover_high,
                 fade_octaves=0.5):
    """Partition-of-unity band weights per bank (largest FFT first),
    raised-cosine fades of ±fade/2 octave around each crossover."""
    def lowpass(f, edge):
        x = np.clip(np.log2(np.maximum(f, 1e-9) / edge) / fade_octaves + 0.5,
                    0.0, 1.0)
        return 0.5 * (1.0 + np.cos(np.pi * x))

    edges = [crossover_low, crossover_high]
    out = np.zeros((len(sizes), len(row_freqs)))
    remaining = np.ones(len(row_freqs))
    for b in range(len(sizes)):
        if b == len(sizes) - 1:
            out[b] = remaining
        else:
            lp = lowpass(row_freqs, edges[b])
            out[b] = remaining * lp
            remaining = remaining * (1.0 - lp)
    return out


def _center_aligned_frames_count(num_samples, sizes, hop):
    n_max = max(sizes)
    return 0 if num_samples < n_max else (num_samples - n_max) // hop + 1


def multires_natural(x, sizes, hop, rows, sample_rate, f_min, zoom,
                     crossover_low, crossover_high):
    """Natural-mode multires merge: per-bank |X_h|² center-aligned,
    lerp onto the log rows, band-weighted, scaled 1/N² per bank."""
    x = np.asarray(x, np.float64)
    n_max = max(sizes)
    t_count = _center_aligned_frames_count(len(x), sizes, hop)
    row_freqs = log_freq_axis(rows, f_min, sample_rate / 2.0, zoom)
    bw = band_weights(row_freqs, sizes, crossover_low, crossover_high)
    out = np.zeros((t_count, rows))
    for b, n in enumerate(sizes):
        off = (n_max - n) // 2
        h, _, _ = windows(n)
        bin_f = np.arange(n // 2 + 1) * (sample_rate / n)
        for t in range(t_count):
            frame = x[off + t * hop: off + t * hop + n]
            spec = np.abs(np.fft.rfft(frame * h)) ** 2
            # non-finite scrub, mirroring Pipeline._bank_power
            spec = np.where(np.isfinite(spec), spec, 0.0)
            out[t] += np.interp(row_freqs, bin_f, spec) * bw[b] / (n * n)
    return out


def multires_enhanced(x, sizes, hop, rows, sample_rate, f_min, zoom,
                      crossover_low, crossover_high, power_floor=1e-12):
    """Enhanced-mode multires: reassigned energy histogrammed directly on
    the (t, rows) log-frequency display grid; band weights evaluated at
    the source bin frequency."""
    x = np.asarray(x, np.float64)
    n_max = max(sizes)
    t_count = _center_aligned_frames_count(len(x), sizes, hop)
    row_freqs = log_freq_axis(rows, f_min, sample_rate / 2.0, zoom)
    bw_rows = band_weights(row_freqs, sizes, crossover_low, crossover_high)
    a = np.log2(row_freqs[0])
    bmap = (rows - 1) / (np.log2(row_freqs[-1]) - np.log2(row_freqs[0]))
    out = np.zeros((t_count, rows))
    for b, n in enumerate(sizes):
        off = (n_max - n) // 2
        h, th, dh = windows(n)
        k_count = n // 2 + 1
        bin_f = np.arange(k_count) * (sample_rate / n)
        # band weight per source bin, evaluated analytically at the bin
        # frequency (the spec; zoom-independent, exactly zero out of band)
        bw_bins = band_weights(bin_f, sizes, crossover_low, crossover_high)[b]
        for t in range(t_count):
            frame = x[off + t * hop: off + t * hop + n]
            X_h = np.fft.rfft(frame * h)
            X_th = np.fft.rfft(frame * th)
            X_dh = np.fft.rfft(frame * dh)
            for k in range(k_count):
                p = abs(X_h[k]) ** 2
                if p <= power_floor:
                    continue
                dt = (X_th[k] * np.conj(X_h[k])).real / p
                dw = -(X_dh[k] * np.conj(X_h[k])).imag / p
                if abs(dt) > n / 2.0:   # beyond the window support
                    continue
                f_hat = (k + dw * n / (2 * np.pi)) * (sample_rate / n)
                if f_hat <= 0:
                    continue
                col = t + int(np.round(dt / hop))   # relative rounding
                row = int(round((np.log2(max(f_hat, 1e-6)) - a) * bmap))
                if 0 <= col < t_count and 0 <= row < rows:
                    out[col, row] += p * bw_bins[k] / (n * n)
    return out
