"""ctypes bindings for the native ingest runtime (emspec_native.cpp).

Loads ``libemspec_native.so`` next to this file, building it with the
repo Makefile on first use if a C++ toolchain is present.  Every consumer
gates on :func:`available` and falls back to the numpy implementations —
the native layer is an accelerator of the L1 host path, never a
requirement (SURVEY.md §2.4).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libemspec_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", str(_DIR)], capture_output=True,
                           text=True, timeout=120)
        return r.returncode == 0 and _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    c = ctypes
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.emspec_ring_create.restype = c.c_void_p
    lib.emspec_ring_create.argtypes = [c.c_int64, c.c_int64]
    lib.emspec_ring_destroy.argtypes = [c.c_void_p]
    lib.emspec_ring_total_written.restype = c.c_int64
    lib.emspec_ring_total_written.argtypes = [c.c_void_p]
    lib.emspec_ring_capacity.restype = c.c_int64
    lib.emspec_ring_capacity.argtypes = [c.c_void_p]
    lib.emspec_ring_push.argtypes = [c.c_void_p, p_f32, c.c_int64]
    lib.emspec_ring_push_interleaved.argtypes = [c.c_void_p, p_f32, c.c_int64]
    lib.emspec_ring_window.restype = c.c_int32
    lib.emspec_ring_window.argtypes = [c.c_void_p, c.c_int64, c.c_int64, p_f32]

    lib.emspec_frame_extract.restype = c.c_int64
    lib.emspec_frame_extract.argtypes = [p_f32, c.c_int64, c.c_int64,
                                         c.c_int64, p_f32]

    lib.emspec_wav_read.restype = c.c_void_p
    lib.emspec_wav_read.argtypes = [c.c_char_p]
    lib.emspec_wav_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.emspec_wav_data.argtypes = [c.c_void_p]
    for fn in ("emspec_wav_channels", "emspec_wav_samples",
               "emspec_wav_sample_rate"):
        getattr(lib, fn).restype = c.c_int64
        getattr(lib, fn).argtypes = [c.c_void_p]
    lib.emspec_wav_free.argtypes = [c.c_void_p]

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeRingBuffer:
    """SPSC lock-free ring (same contract as emspec.io.ring.RingBuffer)."""

    def __init__(self, capacity: int, channels: int = 1):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.emspec_ring_create(capacity, channels)
        if not self._h:
            raise MemoryError("emspec_ring_create failed")
        self.capacity = capacity
        self.channels = channels

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.emspec_ring_destroy(h)
            self._h = None

    @property
    def total_written(self) -> int:
        return self._lib.emspec_ring_total_written(self._h)

    def push(self, samples: np.ndarray) -> None:
        x = np.ascontiguousarray(samples, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[0] != self.channels:
            raise ValueError(f"expected {self.channels} channels, got {x.shape[0]}")
        self._lib.emspec_ring_push(self._h, x, x.shape[1])

    def push_interleaved(self, frames: np.ndarray) -> None:
        """(k, channels) interleaved — the audio-callback layout."""
        x = np.ascontiguousarray(frames, np.float32)
        self._lib.emspec_ring_push_interleaved(self._h, x, x.shape[0])

    def window_at(self, start_abs: int, n: int) -> np.ndarray:
        out = np.empty((self.channels, n), np.float32)
        rc = self._lib.emspec_ring_window(self._h, start_abs, n, out)
        if rc == -1:
            raise ValueError("window extends past the last written sample")
        if rc == -2:
            raise ValueError("window no longer in the ring (overrun)")
        if rc != 0:
            raise ValueError(f"emspec_ring_window failed: {rc}")
        return out

    def latest(self, n: int) -> np.ndarray:
        total = self.total_written
        n = min(n, total)
        return self.window_at(total - n, n)


def frame_extract(x: np.ndarray, n: int, hop: int) -> np.ndarray:
    """Native strided framing: (samples,) → (t, n) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    t = 0 if len(x) < n else (len(x) - n) // hop + 1
    out = np.empty((t, n), np.float32)
    if t:
        got = lib.emspec_frame_extract(x, len(x), n, hop, out)
        assert got == t
    return out


def read_wav(path) -> tuple[np.ndarray, int]:
    """Native WAV decode: → ((channels, samples) float32, rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.emspec_wav_read(str(path).encode())
    if not h:
        raise ValueError(f"could not decode WAV: {path}")
    try:
        ch = lib.emspec_wav_channels(h)
        ns = lib.emspec_wav_samples(h)
        rate = lib.emspec_wav_sample_rate(h)
        ptr = lib.emspec_wav_data(h)
        data = np.ctypeslib.as_array(ptr, shape=(ch, ns)).copy()
    finally:
        lib.emspec_wav_free(h)
    return data, int(rate)
