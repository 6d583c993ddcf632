"""Frame extraction: slice a signal into overlapping analysis frames (L2).

Convention (shared with the float64 oracle in ``tests/oracle.py``):
frame ``t`` covers samples ``[t*hop, t*hop + n)`` and its *center* — the
time the resulting spectrogram column represents — is sample
``t*hop + n/2``.  The reassignment time correction Δt is measured from
that center (see ``emspec.dsp.windows``).

Reference behavior evidence: the "FFT Size" dropdown and "Scroll Speed"
slider (reference README.md:43-44) couple frame length and hop to the
display column rate; the north star calls these "ring-buffer hops"
[NS configs[3]].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def num_frames(num_samples: int, n: int, hop: int) -> int:
    """Frames that fit fully inside ``num_samples`` (no padding)."""
    if num_samples < n:
        return 0
    return (num_samples - n) // hop + 1


def frame_signal(x: jnp.ndarray, n: int, hop: int) -> jnp.ndarray:
    """(..., samples) → (..., frames, n) overlapping view (device, jit-safe).

    Implemented as a strided gather: XLA turns the (frames, n) index grid
    into an efficient dynamic-slice/gather; shapes are static under jit.
    """
    t = num_frames(x.shape[-1], n, hop)
    if t <= 0:
        return jnp.zeros(x.shape[:-1] + (0, n), x.dtype)
    starts = np.arange(t) * hop                     # static under jit
    idx = starts[:, None] + np.arange(n)[None, :]   # (t, n) static index grid
    return x[..., idx]


def frame_signal_np(x: np.ndarray, n: int, hop: int) -> np.ndarray:
    """Host-side zero-copy framing via stride tricks (for the ingest path)."""
    t = num_frames(x.shape[-1], n, hop)
    if t <= 0:
        return np.zeros(x.shape[:-1] + (0, n), x.dtype)
    s = x.strides[-1]
    return np.lib.stride_tricks.as_strided(
        x,
        shape=x.shape[:-1] + (t, n),
        strides=x.strides[:-1] + (hop * s, s),
        writeable=False,
    )
