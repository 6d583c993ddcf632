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

import jax
import jax.numpy as jnp
import numpy as np

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


def stft_triple(x: jnp.ndarray, n: int, hop: int,
                method: str = "stencil") -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The three auxiliary-window STFTs needed by reassignment.

    Returns ``(X_h, X_th, X_dh)`` each of shape (..., frames, n//2+1).

    method="direct": one rfft over a stacked (3, ..., frames, n) batch —
    the straightforward formulation (SURVEY.md §2.2 "Batched rFFT").

    method="stencil" (default): only **2** rffts (raw frame + t·h frame);
    ``X_h`` and ``X_dh`` follow *exactly* (modulation theorem, exact on
    the DFT grid for the periodic Hann) from 3-point stencils on the raw
    spectrum:

        X_h(k)  = ½X(k) − ¼X(k−1) − ¼X(k+1)
        X_dh(k) = −i·(π/2N)·(X(k−1) − X(k+1))

    33% less FFT work — the dominant stage of the hot path.  Differences
    vs "direct" are float32 rounding only (parity-tested).  rfft (unlike
    a packed complex FFT) is bitwise batch-shape-stable, which preserves
    the streaming ≡ batch bit-exactness guarantee.
    """
    frames = frame_signal(x, n, hop)                       # (..., t, n)
    if method == "direct":
        w3 = jnp.asarray(window_triple(n, frames.dtype))   # (3, n)
        shaped = w3.reshape((3,) + (1,) * (frames.ndim - 1) + (n,))
        windowed = frames[None, ...] * shaped              # (3, ..., t, n)
        X = jnp.fft.rfft(windowed, axis=-1)                # (3, ..., t, k)
        return X[0], X[1], X[2]
    return stft_triple_stencil(frames)


def stencil_from_raw(X: jnp.ndarray, X_th: jnp.ndarray, n: int):
    """(raw spectrum, t·h spectrum) → (X_h, X_th, X_dh) via the exact
    periodic-Hann stencils; neighbors at k = −1 and N/2+1 come from
    Hermitian symmetry of the real input."""
    Xm1 = jnp.concatenate([jnp.conj(X[..., 1:2]), X[..., :-1]], axis=-1)
    Xp1 = jnp.concatenate([X[..., 1:], jnp.conj(X[..., -2:-1])], axis=-1)
    X_h = 0.5 * X - 0.25 * (Xm1 + Xp1)
    X_dh = _mul_neg_i(0.5 * jnp.pi / n, Xm1 - Xp1)
    return X_h, X_th, X_dh


def _mul_neg_i(c: float, z: jnp.ndarray) -> jnp.ndarray:
    """(−i·c)·z for real c, in real arithmetic: re = c·z.im, im = −c·z.re.

    Mathematically identical to ``(-1j * c) * z`` but never materializes
    a complex *constant*: this machine's remote-TPU relay cannot
    device_put complex values (the transfer hangs), which broke every
    EAGER caller of the stencil — jitted callers fold the constant into
    HLO and never noticed.  Also one real multiply cheaper."""
    c = jnp.asarray(c, z.real.dtype)
    return jax.lax.complex(c * z.imag, -c * z.real)


def stft_triple_stencil_sliced(frames: jnp.ndarray, k_lo: int, k_hi: int
                               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pruned-DFT reassignment spectra: only bins [k_lo, k_hi) of
    (X_h, X_th, X_dh), computed as one MXU GEMM instead of a full FFT.

    Band-support slicing (Pipeline.k_slices) leaves the long multires
    banks needing a tiny fraction of their spectrum — the default
    8192-bank keeps 43 of 4097 bins.  A full FFT computes all of them;
    the DFT restricted to K kept bins is a (batch, n) @ (n, K+2) matmul,
    which the MXU runs an order of magnitude faster than the FFT's
    memory-bound butterflies when K ≪ n (measured crossover in
    ``Pipeline._use_pruned_dft``).

    The DFT matrix is evaluated at integer k from k_lo−1 to k_hi
    (stencil neighbors included): out-of-range k = −1 / N/2+1 need no
    Hermitian special-casing — e^{−2πi(−1)n/N} IS conj-symmetric for the
    real input by construction.  Matrix built in float64, cast to f32;
    cos and sin columns are packed side by side into ONE GEMM (K is far
    below the 128-lane tile, so the imag columns ride for free) and
    contracted at Precision.HIGH — 3-pass bf16 split, measured 9.4e-6
    max relative error at n=8192 (the f32 FFT's own √N·ε class) and
    2.4× the HIGHEST-precision rate (BENCH.md round 2).
    """
    from emspec.dsp.windows import time_weighted_hann

    n = frames.shape[-1]
    lead = frames.shape[:-1]
    ks = np.arange(k_lo - 1, k_hi + 1)
    ang = (-2.0 * np.pi / n) * np.outer(np.arange(n), ks)      # float64
    w = jnp.asarray(np.concatenate([np.cos(ang), np.sin(ang)], axis=1),
                    jnp.float32)                               # (n, 2(K+2))
    th = jnp.asarray(time_weighted_hann(n, frames.dtype))
    f2 = frames.reshape(-1, n)
    pair = jnp.concatenate([f2, f2 * th], axis=0)              # (2B, n)
    out = jnp.dot(pair, w, precision=jax.lax.Precision.HIGH)
    re, im = out[..., :len(ks)], out[..., len(ks):]
    X = jax.lax.complex(re, im).reshape((2, -1, len(ks)))
    Xe = X[0].reshape(lead + (len(ks),))
    X_th = X[1].reshape(lead + (len(ks),))[..., 1:-1]
    X_h = 0.5 * Xe[..., 1:-1] - 0.25 * (Xe[..., :-2] + Xe[..., 2:])
    X_dh = _mul_neg_i(0.5 * jnp.pi / n, Xe[..., :-2] - Xe[..., 2:])
    return X_h, X_th, X_dh


def stft_triple_stencil_blocks(x2: jnp.ndarray, t: int, n: int,
                               k_lo: int, k_hi: int
                               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pruned-DFT reassignment spectra straight from hop blocks —
    the (t, n) frames array is never materialized.

    With x2 = signal_blocks(x, n, hop) of shape (..., rows, hop) and
    m = ⌈n/hop⌉, frame t is rows t..t+m-1 concatenated, so

        frames @ W  =  Σ_j  x2[..., j:j+t, :] @ W[j·hop:(j+1)·hop, :]

    — m shifted-slice GEMMs accumulated in f32 instead of one framed
    GEMM, with identical flops and no 4·t·n-byte HBM round trip (~94 MB
    per call at the multires 8192-bank shape; the block sum reads the
    compact x2 instead).  The t·h windowing FOLDS INTO the DFT matrix
    (diag(th)·W), so both chains ride the same GEMMs: columns are
    [cos | sin | th·cos | th·sin].

    Same math as stft_triple_stencil_sliced; the m-partial f32
    accumulation order differs from the single-GEMM K-loop, which sits
    inside the pruned path's existing TPU tolerance contract (this path
    is TPU-only — Pipeline._use_pruned_dft)."""
    from emspec.dsp.windows import time_weighted_hann

    hop = x2.shape[-1]
    m = -(-n // hop)
    lead = x2.shape[:-2]
    ks = np.arange(k_lo - 1, k_hi + 1)
    ang = (-2.0 * np.pi / n) * np.outer(np.arange(n), ks)      # float64
    w = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)     # (n, 2(K+2))
    th = np.asarray(time_weighted_hann(n, np.float64))
    w4 = np.concatenate([w, th[:, None] * w], axis=1)          # (n, 4(K+2))
    if m * hop != n:                                           # hop ∤ n tail
        w4 = np.pad(w4, ((0, m * hop - n), (0, 0)))
    wj = jnp.asarray(w4.reshape(m, hop, -1), jnp.float32)
    acc = jnp.zeros(lead + (t, wj.shape[-1]), jnp.float32)
    for j in range(m):
        acc = acc + jnp.dot(x2[..., j:j + t, :], wj[j],
                            precision=jax.lax.Precision.HIGH)
    K2 = len(ks)
    Xe = jax.lax.complex(acc[..., :K2], acc[..., K2:2 * K2])
    X_th = jax.lax.complex(acc[..., 2 * K2:3 * K2],
                           acc[..., 3 * K2:])[..., 1:-1]
    X_h = 0.5 * Xe[..., 1:-1] - 0.25 * (Xe[..., :-2] + Xe[..., 2:])
    X_dh = _mul_neg_i(0.5 * jnp.pi / n, Xe[..., :-2] - Xe[..., 2:])
    return X_h, X_th, X_dh


def stft_triple_stencil(frames: jnp.ndarray, fft_impl: str = "xla"
                        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stencil-method reassignment spectra from pre-cut frames (..., n) —
    see :func:`stft_triple`.  Works on any leading shape (the frame axis
    is optional: streaming passes single windows).

    fft_impl="xla": two batched rffts (bitwise batch-shape-stable).
    fft_impl="fourstep": ONE complex four-step MXU-matmul FFT with the raw
    and t·h frames packed as real/imag (emspec.dsp.fourstep) — the TPU
    fast path; float32-rounding-level differences vs "xla".
    """
    n = frames.shape[-1]
    X, X_th = stft_raw_pair(frames, fft_impl)
    return stencil_from_raw(X, X_th, n)


def stft_raw_pair(frames: jnp.ndarray, fft_impl: str = "xla"
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(raw spectrum X, t·h spectrum X_th) of pre-cut frames — the shared
    front half of the stencil method (see stft_triple_stencil for the
    engine semantics)."""
    from emspec.dsp.windows import time_weighted_hann

    n = frames.shape[-1]
    th = jnp.asarray(time_weighted_hann(n, frames.dtype))
    if fft_impl == "fourstep":
        from emspec.dsp.fourstep import packed_pair_fft
        return packed_pair_fft(frames, frames * th)
    stack = jnp.stack([frames, frames * th])               # (2, ..., n)
    F = jnp.fft.rfft(stack, axis=-1)                       # (2, ..., k)
    return F[0], F[1]
