"""AudioFeeder plumbing (emspec/shell/feed.py) — the shared producer
behind both window shells.  The channel-adaptation contract matters
because the app's stream is swapped on structural settings changes while
a capture source keeps delivering chunks at its own channel count: a
shape mismatch would kill the producer thread silently."""

from types import SimpleNamespace

import numpy as np

from emspec.shell.feed import AudioFeeder


class FakeRing:
    def __init__(self):
        self.chunks = []

    def push(self, chunk):
        self.chunks.append(np.asarray(chunk))


def feeder_with(channels: int):
    ring = FakeRing()
    app = SimpleNamespace(stream=SimpleNamespace(channels=channels,
                                                 ring=ring))
    return AudioFeeder(app), ring


def test_ring_push_mono_stream_accepts_both_shapes():
    f, ring = feeder_with(1)
    f._ring_push(np.zeros(64, np.float32))
    f._ring_push(np.zeros((2, 64), np.float32))   # stereo capture → ch 0
    assert ring.chunks[0].shape == (64,)
    assert ring.chunks[1].shape == (64,)


def test_ring_push_adapts_channel_count_both_ways():
    f, ring = feeder_with(4)
    # mono source broadcast up to 4 channels
    f._ring_push(np.arange(8, dtype=np.float32))
    assert ring.chunks[0].shape == (4, 8)
    np.testing.assert_array_equal(ring.chunks[0][3], np.arange(8))
    # 3-channel source tiled then truncated to 4
    x = np.stack([np.full(8, c, np.float32) for c in range(3)])
    f._ring_push(x)
    assert ring.chunks[1].shape == (4, 8)
    np.testing.assert_array_equal(ring.chunks[1][3], np.zeros(8))  # wraps
    # 6-channel source truncated to the first 4
    x = np.stack([np.full(8, c, np.float32) for c in range(6)])
    f._ring_push(x)
    np.testing.assert_array_equal(ring.chunks[2][3], np.full(8, 3.0))


def test_ring_push_survives_structural_stream_swap():
    """The feeder resolves app.stream at call time — a swapped stream
    with a different channel count keeps receiving valid chunks."""
    f, ring = feeder_with(2)
    f._ring_push(np.zeros((2, 16), np.float32))
    assert ring.chunks[-1].shape == (2, 16)
    ring2 = FakeRing()
    f.app.stream = SimpleNamespace(channels=1, ring=ring2)  # settings change
    f._ring_push(np.zeros((2, 16), np.float32))
    assert ring2.chunks[-1].shape == (16,)


def test_wav_feeder_restarts_after_stop(tmp_path):
    """stop() then start() must re-arm the stop event: a restarted WAV
    feeder previously launched a thread whose loop exited immediately,
    silently feeding nothing (round-3 advisor finding)."""
    import time

    from emspec.io.wav import write_wav

    wav = tmp_path / "loop.wav"
    write_wav(wav, np.sin(np.arange(4800) / 5.0).astype(np.float32), 48_000)
    ring = FakeRing()
    app = SimpleNamespace(
        settings=SimpleNamespace(sample_rate=48_000, channels=1,
                                 display_channel=0),
        stream=SimpleNamespace(channels=1, ring=ring))
    f = AudioFeeder(app, source="wav", wav_path=str(wav))

    def wait_chunks(n, timeout=5.0):
        t0 = time.time()
        while len(ring.chunks) < n and time.time() - t0 < timeout:
            time.sleep(0.01)
        return len(ring.chunks)

    f.start()
    assert wait_chunks(1) >= 1
    f.stop()
    mark = len(ring.chunks)
    time.sleep(0.1)                      # loop really stopped
    assert len(ring.chunks) - mark <= 1  # at most one in-flight block
    f.start()
    assert wait_chunks(mark + 2) >= mark + 2   # feeding again
    f.stop()
