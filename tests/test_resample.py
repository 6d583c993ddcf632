"""Streaming polyphase resampler tests (capture-rate adaptation, L1).

Pins: chunking invariance (any chunking of the input produces the
identical output stream — the property the capture callback relies on),
tone fidelity through the 44.1↔48 kHz conversions the feature exists
for, anti-alias attenuation when downsampling, and the capture wiring
that opens the device at its native rate and resamples into the
pipeline rate."""

import sys
import types

import numpy as np
import pytest

from emspec.io.resample import StreamingResampler, design_polyphase


def _run_chunked(rs, x, sizes):
    outs, pos = [], 0
    i = 0
    while pos < x.shape[-1]:
        k = sizes[i % len(sizes)]
        i += 1
        outs.append(rs.process(x[..., pos:pos + k]))
        pos += k
    outs.append(rs.flush())
    return np.concatenate([o for o in outs if o.shape[-1]], axis=-1)


def _snr_db(out, expected):
    err = out - expected
    return 10 * np.log10(np.sum(expected ** 2) / max(np.sum(err ** 2), 1e-30))


def test_identity_rates_pass_through():
    rs = StreamingResampler(48_000, 48_000)
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    assert rs.identity and np.array_equal(rs.process(x), x)
    assert rs.delay_seconds == 0.0


@pytest.mark.parametrize("in_rate,out_rate", [(44_100, 48_000),
                                              (48_000, 44_100),
                                              (48_000, 96_000),
                                              (96_000, 48_000)])
def test_tone_fidelity(in_rate, out_rate):
    rs = StreamingResampler(in_rate, out_rate)
    f = 997.0
    t_in = np.arange(int(in_rate * 0.25)) / in_rate
    x = np.sin(2 * np.pi * f * t_in).astype(np.float32)
    out = _run_chunked(rs, x, [441])
    n = np.arange(out.shape[-1])
    expected = np.sin(2 * np.pi * f * (n / out_rate - rs.delay_seconds))
    # steady-state region: skip filter warm-up and the flushed tail
    guard = 4 * rs.taps
    s = slice(guard, out.shape[-1] - guard)
    assert _snr_db(out[s], expected[s].astype(np.float32)) > 60.0


def test_chunking_invariance_is_exact():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9000)).astype(np.float32)
    batch = StreamingResampler(44_100, 48_000)
    y_batch = np.concatenate([batch.process(x), batch.flush()], axis=-1)
    for sizes in ([1, 7, 640, 3], [512], [4096, 100]):
        rs = StreamingResampler(44_100, 48_000)
        y = _run_chunked(rs, x, sizes)
        assert y.shape == y_batch.shape
        assert np.array_equal(y, y_batch), f"chunking {sizes} changed output"


def test_output_rate_and_mono_shape():
    rs = StreamingResampler(44_100, 48_000)
    x = np.zeros(44_100, np.float32)
    out = np.concatenate([rs.process(x), rs.flush()])
    assert out.ndim == 1
    assert abs(out.shape[0] - 48_000) <= rs.taps * 2


def test_alias_rejection_when_downsampling():
    # a 23 kHz tone at 48 kHz has no representation at 44.1 kHz
    # (output Nyquist 22.05 kHz) — a proper anti-alias filter must kill
    # it rather than fold it to 21.1 kHz.  Use a longer filter than the
    # latency-lean default so the transition band clears 23 kHz.
    rs = StreamingResampler(48_000, 44_100, taps_per_phase=128,
                            rolloff=0.90)
    t = np.arange(24_000) / 48_000
    x = np.sin(2 * np.pi * 23_000.0 * t).astype(np.float32)
    out = np.concatenate([rs.process(x), rs.flush()])
    in_rms = np.sqrt(np.mean(x ** 2))
    out_rms = np.sqrt(np.mean(out[1000:-1000] ** 2))
    assert 20 * np.log10(out_rms / in_rms) < -60.0


def test_polyphase_dc_gain():
    h_rev = design_polyphase(160, 147)
    # each phase is one valid filter snapshot: all phases together must
    # reconstruct a unity-DC prototype (sum = up after the up gain)
    assert np.isclose(h_rev.sum(), 160.0, rtol=1e-12)


def test_channel_change_mid_stream_rejected():
    rs = StreamingResampler(44_100, 48_000)
    rs.process(np.zeros((2, 100), np.float32))
    with pytest.raises(ValueError):
        rs.process(np.zeros((3, 100), np.float32))


# ------------------------------------------------------- capture wiring
def test_capture_resamples_mismatched_device_rate(monkeypatch):
    """A device that can't run the pipeline rate is opened at its native
    rate and the callback delivers pipeline-rate audio to the sink."""
    fake = types.ModuleType("sounddevice")
    opened = {}

    def check_input_settings(device=None, samplerate=None, channels=None):
        if samplerate != 44_100:
            raise RuntimeError(f"rate {samplerate} unsupported")

    def query_devices(device=None, kind=None):
        if kind == "input" or device is not None:
            return {"name": "Fake Mic", "max_input_channels": 2,
                    "default_samplerate": 44_100.0}
        return [{"name": "Fake Mic", "max_input_channels": 2,
                 "default_samplerate": 44_100.0}]

    class FakeStream:
        def __init__(self, samplerate=None, channels=None, blocksize=None,
                     dtype=None, device=None, callback=None):
            opened["samplerate"] = samplerate
            self.callback = callback

        def start(self):
            pass

        def stop(self):
            pass

        def close(self):
            pass

    fake.check_input_settings = check_input_settings
    fake.query_devices = query_devices
    fake.InputStream = FakeStream
    monkeypatch.setitem(sys.modules, "sounddevice", fake)

    from emspec.io.capture import SoundDeviceCapture
    got = []
    cap = SoundDeviceCapture(got.append, sample_rate=48_000, channels=1,
                             prefer_loopback=False)
    cap.start()
    assert opened["samplerate"] == 44_100 and cap.device_rate == 44_100
    # feed 0.5 s of a 997 Hz tone at the DEVICE rate through the callback
    f, dev = 997.0, 44_100
    x = np.sin(2 * np.pi * f * np.arange(dev // 2) / dev).astype(np.float32)
    for i in range(0, x.shape[0] - 441, 441):
        cap._stream.callback(x[i:i + 441, None], 441, None, None)
    out = np.concatenate([c[0] for c in got], axis=-1)
    # the sink saw pipeline-rate audio: right length, right tone
    assert abs(out.shape[0] - x.shape[0] * 48_000 / 44_100) < 2000
    rs_delay = cap._resampler.delay_seconds
    n = np.arange(out.shape[0])
    expected = np.sin(2 * np.pi * f * (n / 48_000 - rs_delay))
    guard = 256
    assert _snr_db(out[guard:-guard],
                   expected[guard:-guard].astype(np.float32)) > 60.0
    cap.stop()


def test_capture_matching_rate_has_no_resampler(monkeypatch):
    fake = types.ModuleType("sounddevice")
    fake.check_input_settings = lambda **kw: None
    fake.query_devices = lambda *a, **kw: []

    class FakeStream:
        def __init__(self, **kw):
            self.kw = kw

        def start(self):
            pass

    fake.InputStream = FakeStream
    monkeypatch.setitem(sys.modules, "sounddevice", fake)
    from emspec.io.capture import SoundDeviceCapture
    cap = SoundDeviceCapture(lambda c: None, sample_rate=48_000,
                             prefer_loopback=False)
    cap.start()
    assert cap.device_rate == 48_000 and cap._resampler is None


def test_flush_shape_matches_fed_shape():
    """flush() mirrors the leading shape process() returned — a stream fed
    2-D (1, k) chunks must get a 2-D tail so callers can concatenate."""
    from emspec.io.resample import StreamingResampler

    rs = StreamingResampler(44_100, 48_000)
    y = rs.process(np.zeros((1, 1000), np.float32))
    f = rs.flush()
    assert y.ndim == 2 and f.ndim == 2 and f.shape[0] == 1
    np.concatenate([y, f], axis=-1)          # must not raise

    rs = StreamingResampler(44_100, 48_000)
    y = rs.process(np.zeros(1000, np.float32))
    f = rs.flush()
    assert y.ndim == 1 and f.ndim == 1

    # identity rates: flush is empty but still shape-consistent
    rs = StreamingResampler(48_000, 48_000)
    y = rs.process(np.zeros((2, 64), np.float32))
    f = rs.flush()
    assert f.shape == (2, 0)
    np.concatenate([y, f], axis=-1)


def test_identity_path_normalizes_like_resampling_path():
    """The 1:1 fast path must still honor the float32/(fed rank) output
    contract for float64 or list input (round-3 advisor finding: it
    returned the raw chunk object as-is)."""
    r = StreamingResampler(48_000, 48_000)
    out = r.process(np.arange(8, dtype=np.float64))
    assert out.dtype == np.float32 and out.shape == (8,)
    out = r.process([0.0, 1.0, 2.0])          # list input, mono rank
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.float32 and out.shape == (3,)
    out = r.process(np.zeros((2, 16), np.float64))
    assert out.dtype == np.float32 and out.shape == (2, 16)
