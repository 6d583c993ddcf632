"""Audio feeder: the single ring producer behind every window shell.

Both shells (the web shell in ``server.py`` and the native tkinter window
in ``native.py``) need the same L1 plumbing: a thread that loops a WAV at
its real-time rate, or a capture source (sounddevice loopback/monitor
preferred, synthetic fallback), pushing float32 ``(channels, k)`` blocks
into the app's ring buffer (reference: README.md:36 — the app starts
visualizing audio the moment it opens).  Extracted here so the two shells
share one producer implementation instead of two diverging copies.

Thread model: the feeder thread is the ring's single producer; it only
ever touches ``app.stream.ring`` (seqlock-protected) and — for the WAV
rate/channel adoption at startup — ``app.apply_settings`` under the
shared ``lock``.
"""

from __future__ import annotations

import threading
import time

import numpy as np


class AudioFeeder:
    """Feeds ``app``'s ring from a WAV loop or a live capture source.

    ``source`` is ``"wav"`` (requires ``wav_path``), ``"auto"``,
    ``"sounddevice"``, or ``"synthetic"`` — the non-WAV values are capture
    backends passed to :func:`emspec.io.capture.open_capture`.
    """

    def __init__(self, app, source: str = "auto", wav_path: str | None = None,
                 lock: threading.RLock | None = None, device=None):
        self.app = app
        self.source = source
        self.wav_path = wav_path
        self.lock = lock if lock is not None else threading.RLock()
        self.device = device
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._capture = None

    # ------------------------------------------------------------- plumbing
    def _ring_push(self, chunk: np.ndarray) -> None:
        # the app's stream is swapped on structural changes; resolve at
        # call time and ADAPT the chunk's channel count so a running
        # capture source survives a settings channels change (a shape
        # mismatch would kill the producer thread silently)
        st = self.app.stream
        if st.channels == 1:
            if chunk.ndim == 2:
                chunk = chunk[0]
        else:
            if chunk.ndim == 1:
                chunk = chunk[None]
            have = chunk.shape[0]
            if have > st.channels:
                chunk = chunk[:st.channels]
            elif have < st.channels:
                reps = -(-st.channels // have)
                chunk = np.tile(chunk, (reps, 1))[:st.channels]
        st.ring.push(chunk)

    def _load_wav(self):
        from emspec.io.wav import read_wav
        audio, rate = read_wav(self.wav_path)
        s = self.app.settings
        if rate != s.sample_rate or audio.shape[0] != s.channels:
            with self.lock:
                self.app.apply_settings(s.replace(
                    sample_rate=rate, channels=audio.shape[0],
                    display_channel=min(s.display_channel,
                                        audio.shape[0] - 1)))
        return audio.astype(np.float32), rate

    def _wav_loop(self, x_all: np.ndarray, rate: int,
                  stop: threading.Event) -> None:
        pos = 0
        block = max(rate // 50, 256)
        t0 = time.perf_counter()
        sent = 0
        total = x_all.shape[-1]
        while not stop.is_set():
            # wrap-around take of exactly `block` samples: files shorter
            # than a block still loop (and still pace — a short-file
            # reset must never busy-spin)
            idx = (pos + np.arange(block)) % total
            chunk = np.ascontiguousarray(x_all[..., idx])
            self._ring_push(chunk)
            pos = (pos + block) % total
            sent += block
            delay = t0 + sent / rate - time.perf_counter()
            if delay > 0:
                time.sleep(delay)

    # -------------------------------------------------------------- control
    def start(self) -> None:
        # re-arm after a previous stop() with a FRESH event: each thread
        # captures its own stop event at creation, so a previous thread
        # that outlived stop()'s join timeout keeps its (set) event and
        # still exits — clearing a shared event could revive it and put
        # two producers on the single-producer ring
        self._stop = threading.Event()
        if self.source == "wav":
            x_all, rate = self._load_wav()
            self._thread = threading.Thread(
                target=self._wav_loop, args=(x_all, rate, self._stop),
                daemon=True)
            self._thread.start()
        else:
            from emspec.io.capture import open_capture
            s = self.app.settings
            self._capture = open_capture(
                self._ring_push, backend=self.source,
                sample_rate=s.sample_rate, channels=s.channels,
                device=self.device)
            self._capture.start()

    def stop(self) -> None:
        self._stop.set()
        if self._capture is not None:
            self._capture.stop()
            self._capture = None
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
