"""Batched short-time Fourier transform (L2).

"Natural" mode of the reference (settings.png button) is the plain
``|X_h|^2`` power spectrogram of this module [NS configs[0]: "2048-pt Hann
STFT magnitude spectrogram + dB mapping"].

TPU realization (SURVEY.md §2.2): the three reassignment windows are
applied as one broadcast multiply (fused by XLA; a Pallas fusion exists in
``emspec.dsp.pallas``) and a **single batched** ``jnp.fft.rfft`` runs over
a ``(3, ..., frames, n)`` stack — XLA's native TPU FFT does the transform;
hand-rolling a 32k-point FFT in Pallas is explicitly not the v1 path
(SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from emspec.dsp.frame import frame_signal
from emspec.dsp.windows import hann, window_triple


def stft(x: jnp.ndarray, n: int, hop: int) -> jnp.ndarray:
    """(..., samples) → complex STFT (..., frames, n//2+1) with Hann window."""
    frames = frame_signal(x, n, hop)
    w = jnp.asarray(hann(n, frames.dtype))
    return jnp.fft.rfft(frames * w, axis=-1)


def power_spectrogram(x: jnp.ndarray, n: int, hop: int) -> jnp.ndarray:
    """Natural-mode power spectrogram |X_h|^2, shape (..., frames, n//2+1)."""
    X = stft(x, n, hop)
    return (X.real * X.real + X.imag * X.imag).astype(jnp.float32)


def stft_triple(x: jnp.ndarray, n: int, hop: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The three auxiliary-window STFTs needed by reassignment.

    Returns ``(X_h, X_th, X_dh)`` each of shape (..., frames, n//2+1).
    One rfft call over a stacked (3, ..., frames, n) batch keeps the FFT
    large and batched for the TPU (SURVEY.md §2.2 "Batched rFFT").
    """
    frames = frame_signal(x, n, hop)                       # (..., t, n)
    w3 = jnp.asarray(window_triple(n, frames.dtype))       # (3, n)
    shaped = w3.reshape((3,) + (1,) * (frames.ndim - 1) + (n,))
    windowed = frames[None, ...] * shaped                  # (3, ..., t, n)
    X = jnp.fft.rfft(windowed, axis=-1)                    # (3, ..., t, k)
    return X[0], X[1], X[2]
