"""Native (C++) ingest runtime parity vs the numpy implementations.

Skips cleanly when no C++ toolchain/library is available — the native
layer is an accelerator, never a requirement (SURVEY.md §2.4)."""

import threading

import numpy as np
import pytest

from emspec.native import lib as native
from emspec.io.ring import RingBuffer
from emspec.io.wav import _read_wav_py as read_wav_py, write_wav
from emspec.dsp.frame import frame_signal_np
from emspec.io import synth

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_ring_parity_with_numpy():
    rng = np.random.default_rng(0)
    nat = native.NativeRingBuffer(256, 2)
    ref = RingBuffer(256, 2)
    for _ in range(20):
        chunk = rng.standard_normal((2, rng.integers(1, 90))).astype(np.float32)
        nat.push(chunk)
        ref.push(chunk)
        assert nat.total_written == ref.total_written
        n = int(min(nat.total_written, 100))
        np.testing.assert_array_equal(nat.latest(n), ref.latest(n))


def test_ring_giant_push_and_errors():
    nat = native.NativeRingBuffer(64, 1)
    nat.push(np.arange(100, dtype=np.float32))
    np.testing.assert_array_equal(nat.window_at(90, 10)[0], np.arange(90, 100))
    with pytest.raises(ValueError, match="overrun"):
        nat.window_at(10, 10)
    with pytest.raises(ValueError, match="past the last"):
        nat.window_at(95, 10)


def test_ring_interleaved_push():
    nat = native.NativeRingBuffer(32, 2)
    frames = np.asarray([[1, 10], [2, 20], [3, 30]], np.float32)  # (k, ch)
    nat.push_interleaved(frames)
    w = nat.latest(3)
    np.testing.assert_array_equal(w, [[1, 2, 3], [10, 20, 30]])


def test_ring_concurrent_producer_consumer():
    """SPSC smoke: producer thread streams, consumer reads sequential
    windows; every successfully-read window must contain the exact
    absolute sample values (detects torn reads)."""
    nat = native.NativeRingBuffer(4096, 1)
    total = 200_000

    def produce():
        import time
        pos = 0
        while pos < total:
            k = min(731, total - pos)
            nat.push(np.arange(pos, pos + k, dtype=np.float32))
            pos += k
            time.sleep(0.0003)      # ~real-time-ish pacing so reads interleave

    t = threading.Thread(target=produce)
    t.start()
    read_pos, good = 0, 0
    while read_pos + 512 <= total:
        try:
            w = nat.window_at(read_pos, 512)[0]
        except ValueError:       # not yet written, or we fell behind
            if nat.total_written - nat.capacity > read_pos:
                read_pos = int(nat.total_written) - 2048  # skip ahead
            continue
        np.testing.assert_array_equal(w, np.arange(read_pos, read_pos + 512,
                                                   dtype=np.float32))
        good += 1
        read_pos += 512
    t.join()
    assert good > 50


def test_frame_extract_parity():
    x = synth.noise(0.3, seed=11)
    got = native.frame_extract(x, 512, 128)
    want = frame_signal_np(x, 512, 128)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_parity(tmp_path, channels):
    x = np.stack([synth.tone(440.0 * (c + 1), 0.05) for c in range(channels)])
    p = tmp_path / "t.wav"
    write_wav(p, x, 48_000)
    nat, rate_n = native.read_wav(p)
    ref, rate_p = read_wav_py(p)
    assert rate_n == rate_p == 48_000
    np.testing.assert_array_equal(nat, ref)


def test_wav_24bit_parity(tmp_path):
    """24-bit PCM path of both decoders (hand-built file; write_wav only
    emits 16-bit)."""
    import struct
    rng = np.random.default_rng(5)
    x = (rng.uniform(-1, 1, 200) * 0.9)
    pcm24 = np.clip((x * 8388607).round(), -8388608, 8388607).astype(np.int64)
    body = b"".join(struct.pack("<i", int(v))[:3] for v in pcm24)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000,
                                   48000 * 3, 3, 24)
           + b"data" + struct.pack("<I", len(body)))
    p = tmp_path / "t24.wav"
    p.write_bytes(hdr + body)
    nat, rate_n = native.read_wav(p)
    ref, rate_p = read_wav_py(p)
    assert rate_n == rate_p == 48000
    np.testing.assert_allclose(nat, ref, atol=0)
    np.testing.assert_allclose(nat[0], pcm24 / 8388608.0, atol=1e-7)


def test_wav_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all, sorry")
    with pytest.raises(ValueError):
        native.read_wav(p)


def test_ring_torn_read_detection_adversarial():
    """Hammer the seqlock (SURVEY §5.2): UNPACED producer on a small
    ring — lapping constantly — while the consumer reads spans right at
    the overwrite horizon.  Every window returned as valid must be
    value-exact; a producer lap during the copy must surface as an
    overrun error, never as silently torn data.  (ctypes releases the
    GIL during the C push/window calls, so the two threads genuinely
    overlap inside the ring code.)"""
    nat = native.NativeRingBuffer(1024, 1)
    total = 1_000_000

    def produce():
        pos = 0
        while pos < total:
            k = min(257, total - pos)
            nat.push(np.arange(pos, pos + k, dtype=np.float32))
            pos += k

    t = threading.Thread(target=produce)
    t.start()
    good = detected = 0
    while nat.total_written < total:
        tw = int(nat.total_written)
        start = max(tw - 1024, 0)         # the oldest still-live sample
        try:
            w = nat.window_at(start, 256)[0]
        except ValueError:                # overrun detected — the point
            detected += 1
            continue
        np.testing.assert_array_equal(
            w, np.arange(start, start + 256, dtype=np.float32))
        good += 1
    t.join()
    assert good > 100                     # real valid reads happened
