"""WAV file read/write (L1 ingest boundary).

The reference taps live system audio (reference: README.md:36); the rebuild's
ingest contract is WAV files and synthetic signals fed through the same
ring-buffer interface [NS configs[0]: "Mono 48 kHz WAV"].  Pure stdlib
``wave`` + numpy — supports PCM 16/24/32-bit and float32, any channel count.
Samples are returned as float32 in [-1, 1), shape (channels, samples).
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV file → (samples float32 (channels, n), sample_rate).

    Uses the native C++ decoder when available (proper RIFF chunk walking
    + format-tag handling, emspec/native); falls back to stdlib ``wave``.
    """
    try:
        from emspec.native import lib as native
        if native.available():
            return native.read_wav(path)
    except Exception:
        pass  # any native hiccup falls through to the pure-Python path
    return _read_wav_py(path)


def _read_wav_py(path: str | Path) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        nframes = w.getnframes()
        raw = w.readframes(nframes)

    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        # Could be PCM32 or IEEE float32; wave exposes no format tag, so
        # sniff: valid float32 audio stays within [-4, 4].
        as_f = np.frombuffer(raw, dtype="<f4")
        if as_f.size and np.all(np.isfinite(as_f)) and np.abs(as_f).max() <= 4.0:
            data = as_f.astype(np.float32)
        else:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        i32 = (b[:, 0].astype(np.int32)
               | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        i32 = np.where(i32 & 0x800000, i32 - 0x1000000, i32)
        data = i32.astype(np.float32) / 8388608.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")

    return np.ascontiguousarray(data.reshape(-1, nch).T), rate


def write_wav(path: str | Path, samples: np.ndarray, sample_rate: int) -> None:
    """Write float32 (channels, n) or (n,) samples as 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    pcm = np.clip(x.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(x.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
