"""Live capture adapter (L1 tail — VERDICT #5): the callback-producer
contract, exercised by a real-time-paced thread against the stream's
ring, including the overrun skip-ahead under a producer that doesn't
stop.  The optional sounddevice backend skips cleanly when absent."""

import io
import time

import numpy as np
import pytest

from emspec.config import Settings
from emspec.io.capture import (CaptureUnavailable, SyntheticCapture,
                               open_capture)
from emspec.stream import Stream


def _settings(**kw):
    kw.setdefault("mode", "natural")
    kw.setdefault("multires", False)
    kw.setdefault("fft_size", 1024)
    kw.setdefault("raster_height", 128)
    kw.setdefault("hop", 256)
    return Settings(**kw)


def test_synthetic_capture_feeds_stream_realtime():
    """Capture thread → ring → drain: columns arrive at ~audio rate."""
    st = Stream(_settings())
    cap = SyntheticCapture(st.ring.push, sample_rate=48_000, block=512)
    cap.start()
    cols = []
    deadline = time.perf_counter() + 2.0
    while time.perf_counter() < deadline and len(cols) < 20:
        cols.extend(st.push(np.zeros(0, np.float32)))
        time.sleep(0.02)
    cap.stop()
    assert len(cols) >= 20                     # ~187 hops/s at hop=256
    idx = [c.index for c in cols]
    assert idx == sorted(idx)
    # the signal is loud: emitted columns must not be all-black
    assert max(float(np.asarray(c.vis).max()) for c in cols) > 0.1


def test_capture_overrun_recovery_with_live_producer():
    """A producer that keeps writing while the reader stalls must trigger
    the ring's overrun skip-ahead, not kill the stream (SURVEY.md §5.3
    against a REAL concurrent producer, not a scripted push)."""
    st = Stream(_settings(), ring_seconds=0.05)   # tiny ring: 2400 samples
    cap = SyntheticCapture(st.ring.push, sample_rate=48_000, block=512)
    cap.start()
    try:
        time.sleep(0.7)                        # reader stalls; producer laps
        cols = []
        deadline = time.perf_counter() + 1.5
        while time.perf_counter() < deadline and len(cols) < 5:
            cols.extend(st.push(np.zeros(0, np.float32)))
            time.sleep(0.02)
    finally:
        cap.stop()
    assert st.dropped_frames > 0
    assert len(cols) >= 5                      # stream survived, degraded
    # indices include the dropped gap (absolute audio time contract)
    assert max(c.index for c in cols) >= st.dropped_frames


def test_open_capture_synthetic_and_missing_backend():
    sink = lambda chunk: None
    cap = open_capture(sink, backend="synthetic")
    assert isinstance(cap, SyntheticCapture)
    try:
        import sounddevice  # noqa: F401
        has_sd = True
    except ImportError:
        has_sd = False
    if not has_sd:
        with pytest.raises(CaptureUnavailable):
            open_capture(sink, backend="sounddevice")
        # auto falls back to synthetic
        assert isinstance(open_capture(sink, backend="auto"),
                          SyntheticCapture)
    with pytest.raises(ValueError):
        open_capture(sink, backend="jack")


def test_live_capture_view_smoke():
    """End-to-end: capture thread → stream → waterfall → ANSI frames."""
    from emspec.render.terminal import live_capture_view
    out = io.StringIO()
    n = live_capture_view(_settings(), backend="synthetic", duration=1.2,
                          width=64, out=out)
    assert n > 10
    assert "\x1b[38;2;" in out.getvalue()      # truecolor cells painted


def test_loopback_device_preferred(monkeypatch):
    """With no explicit device, a loopback/monitor input (the OS output
    tap — what the reference visualizes, README.md:36) is preferred over
    the default microphone; --device overrides; clean fallback when the
    host API exposes no loopback (VERDICT round-2 missing #1)."""
    import sys
    import types

    from emspec.io.capture import find_loopback_device

    fake = types.ModuleType("sounddevice")
    devices = [
        {"name": "Built-in Microphone", "max_input_channels": 2},
        {"name": "Speakers", "max_input_channels": 0},       # output-only
        {"name": "Monitor of Built-in Audio Analog Stereo",
         "max_input_channels": 2},
    ]
    fake.query_devices = lambda: devices
    monkeypatch.setitem(sys.modules, "sounddevice", fake)
    from emspec.io.capture import SoundDeviceCapture

    assert find_loopback_device(fake) == (
        2, "Monitor of Built-in Audio Analog Stereo")
    cap = SoundDeviceCapture(lambda c: None)
    assert cap.is_loopback and cap.device == 2
    # explicit device overrides the preference
    cap2 = SoundDeviceCapture(lambda c: None, device=0)
    assert cap2.device == 0 and not cap2.is_loopback
    # WASAPI-style loopback naming also matches
    fake.query_devices = lambda: [
        {"name": "Speakers (Realtek) [Loopback]", "max_input_channels": 2}]
    assert find_loopback_device(fake)[0] == 0
    # no loopback anywhere -> default input, no crash
    fake.query_devices = lambda: devices[:2]
    cap3 = SoundDeviceCapture(lambda c: None)
    assert cap3.device is None and not cap3.is_loopback
    # query failure -> clean skip
    def boom():
        raise RuntimeError("no backend")
    fake.query_devices = boom
    assert find_loopback_device(fake) is None


def test_loopback_skipped_when_channels_insufficient(monkeypatch):
    """A 1-channel monitor source must not shadow the default input for a
    stereo capture — the preference only fires when the loopback can
    actually supply the requested channel count."""
    import sys
    import types

    from emspec.io.capture import find_loopback_device

    fake = types.ModuleType("sounddevice")
    fake.query_devices = lambda: [
        {"name": "Built-in Microphone", "max_input_channels": 2},
        {"name": "Monitor of Built-in Audio Mono", "max_input_channels": 1},
    ]
    monkeypatch.setitem(sys.modules, "sounddevice", fake)
    from emspec.io.capture import SoundDeviceCapture

    assert find_loopback_device(fake, channels=2) is None
    assert find_loopback_device(fake, channels=1) == (
        1, "Monitor of Built-in Audio Mono")
    cap = SoundDeviceCapture(lambda c: None, channels=2)
    assert cap.device is None and not cap.is_loopback


def test_loopback_start_failure_falls_back_to_default_input(monkeypatch):
    """When the auto-preferred monitor source refuses to open, capture
    must retry on the default input instead of crashing — the preference
    may never break a capture the old default-input path served."""
    import sys
    import types

    fake = types.ModuleType("sounddevice")
    fake.query_devices = lambda *a, **kw: (
        [{"name": "Monitor of Built-in Audio", "max_input_channels": 2,
          "default_samplerate": 48_000.0}] if not a and not kw else
        {"name": "x", "max_input_channels": 2,
         "default_samplerate": 48_000.0})
    fake.check_input_settings = lambda **kw: None
    opened = []

    class FakeStream:
        def __init__(self, samplerate=None, channels=None, blocksize=None,
                     dtype=None, device=None, callback=None):
            self.device = device

        def start(self):
            opened.append(self.device)
            if self.device is not None:      # the monitor source is broken
                raise RuntimeError("device refuses the requested settings")

    fake.InputStream = FakeStream
    monkeypatch.setitem(sys.modules, "sounddevice", fake)
    from emspec.io.capture import SoundDeviceCapture

    cap = SoundDeviceCapture(lambda c: None, channels=1)
    assert cap.is_loopback and cap.device == 0
    cap.start()                              # must not raise
    assert opened == [0, None] and cap.device is None and not cap.is_loopback

    # an EXPLICIT device that fails must still surface the error
    opened.clear()
    cap2 = SoundDeviceCapture(lambda c: None, channels=1, device=0)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        cap2.start()
