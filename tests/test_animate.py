"""Animated offline render: the scrolling display as an APNG.

The reference's product is the waterfall's *motion* (README.md:35-39);
``emspec animate`` reproduces it deterministically through the real
streaming path.  Contracts pinned here: APNG round-trip + structural
validity, frame k = the display after k/fps seconds of audio, and the
final frame bit-identical to ``emspec stream``'s snapshot PNG (both
commands drive the identical Stream → Waterfall protocol, so this pin
is cross-command, not self-referential)."""

import math

import numpy as np
import pytest

from emspec.__main__ import main
from emspec.io import synth
from emspec.io.wav import write_wav
from emspec.render.apng import read_apng, write_apng


def test_apng_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (3, 6, 9, 4), dtype=np.uint8)
    p = tmp_path / "a.png"
    write_apng(p, frames, fps=24)
    back, fps = read_apng(p)
    assert fps == 24
    np.testing.assert_array_equal(back, frames)
    # RGB (3-channel) frames round-trip too
    write_apng(p, frames[..., :3], fps=12.5)
    back, fps = read_apng(p)
    assert abs(fps - 12.5) < 0.1
    np.testing.assert_array_equal(back, frames[..., :3])


def test_apng_roundtrip_accepts_generator(tmp_path):
    """Frames stream through the writer one at a time (the animate CLI
    never materializes the raw frame stack)."""
    frames = [np.full((4, 5, 4), v, np.uint8) for v in (0, 128, 255)]
    p = tmp_path / "g.png"
    write_apng(p, iter(frames), fps=30)
    back, _ = read_apng(p)
    np.testing.assert_array_equal(back, np.stack(frames))


def test_apng_writer_rejects_bad_input(tmp_path):
    p = tmp_path / "bad.png"
    with pytest.raises(ValueError, match="at least one frame"):
        write_apng(p, [], fps=30)
    with pytest.raises(ValueError, match="fps must be positive"):
        write_apng(p, np.zeros((1, 2, 2, 4), np.uint8), fps=0)
    mixed = [np.zeros((2, 2, 4), np.uint8), np.zeros((2, 3, 4), np.uint8)]
    with pytest.raises(ValueError, match="shape"):
        write_apng(p, mixed, fps=30)
    with pytest.raises(ValueError, match="uint8"):
        write_apng(p, np.zeros((1, 2, 2, 4), np.float32), fps=30)


def test_apng_reader_rejects_corruption(tmp_path):
    p = tmp_path / "c.png"
    write_apng(p, np.zeros((2, 4, 4, 4), np.uint8), fps=30)
    data = bytearray(p.read_bytes())
    data[40] ^= 0xFF                       # flip a byte inside a chunk body
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        read_apng(p)
    p.write_bytes(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="missing"):
        read_apng(p)


def test_animate_cli_frames_and_stream_parity(tmp_path, capsys):
    """The headline contract: frame count = ceil(duration·fps); frames
    actually progress (later frames repaint columns); the LAST frame ==
    the ``emspec stream`` snapshot PNG of the same audio, bitwise —
    chunking differs (fps ticks vs --chunk 1024) so this leans on the
    streaming chunk-invariance the stream suite pins."""
    from emspec.render.png import read_png

    wav = tmp_path / "t.wav"
    dur = 0.3
    write_wav(wav, synth.chirp(300.0, 8000.0, dur), 48_000)
    out = tmp_path / "anim.png"
    flags = ["--no-multires", "--fft-size", "1024", "--width", "64"]
    rc = main(["animate", str(wav), str(out), "--fps", "20"] + flags)
    assert rc == 0
    assert "frames @ 20 fps" in capsys.readouterr().out
    frames, fps = read_apng(out)
    assert fps == 20
    n_samples = int(round(dur * 48_000))
    assert frames.shape[0] == math.ceil(n_samples * 20 / 48_000)
    assert frames.shape[3] == 4
    # motion: the display at t=1/fps differs from the final state
    assert not np.array_equal(frames[0], frames[-1])

    ref = tmp_path / "wf.png"
    rc = main(["stream", str(wav), str(ref)] + flags)
    assert rc == 0
    np.testing.assert_array_equal(frames[-1], read_png(ref))


def test_animate_cli_all_channels_tiled(tmp_path, capsys):
    wav = tmp_path / "st.wav"
    x = np.stack([np.asarray(synth.tone(300.0, 0.2)),
                  np.asarray(synth.tone(1200.0, 0.2))])
    write_wav(wav, x, 48_000)
    out = tmp_path / "anim2.png"
    rc = main(["animate", str(wav), str(out), "--channel", "all",
               "--fps", "10", "--no-multires", "--fft-size", "1024",
               "--width", "32"])
    assert rc == 0
    assert "x2ch" in capsys.readouterr().out
    frames, _ = read_apng(out)
    # two waterfalls tiled side by side with the 2 px separator
    assert frames.shape[2] == 32 * 2 + 2


def test_animate_cli_usage_errors(tmp_path, capsys):
    wav = tmp_path / "t.wav"
    write_wav(wav, synth.tone(440.0, 0.1), 48_000)
    rc = main(["animate", str(wav), str(tmp_path / "o.png"),
               "--fps", "-5", "--no-multires", "--fft-size", "1024"])
    assert rc == 2
    assert "fps must be positive" in capsys.readouterr().err


def test_animate_api_rejects_channel_mismatch():
    from emspec.config import Settings
    from emspec.render.animate import animate_frames

    s = Settings(fft_size=1024, multires=False, channels=1)
    with pytest.raises(ValueError, match="channels"):
        next(animate_frames(np.zeros((2, 4096), np.float32), s, fps=10))


def test_apng_reader_rejects_orphan_frame_chunks(tmp_path):
    """Malformed chunk ORDER is a clean ValueError, not an IndexError:
    fdAT/fcTL arriving before their prerequisites."""
    import struct
    import zlib

    from emspec.render.png import png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    actl = png_chunk(b"acTL", struct.pack(">II", 1, 0))
    fdat = png_chunk(b"fdAT", struct.pack(">I", 1) + zlib.compress(b"\x00" * 18))
    p = tmp_path / "orphan.png"
    p.write_bytes(sig + ihdr + actl + fdat + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="fdAT before"):
        read_apng(p)
    fctl = png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 2, 2, 0, 0, 1, 30, 0, 0))
    p.write_bytes(sig + fctl)
    with pytest.raises(ValueError, match="fcTL before IHDR"):
        read_apng(p)


def test_apng_reader_clean_error_on_corrupt_frame_data(tmp_path):
    """CRC-valid file whose frame data is empty (fcTL with no IDAT) or
    corrupt compressed bytes → the documented ValueError, not a
    zlib.error (ADVICE round 4)."""
    import struct

    from emspec.render.png import png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    actl = png_chunk(b"acTL", struct.pack(">II", 1, 0))
    fctl = png_chunk(b"fcTL", struct.pack(">IIIIIHHBB",
                                          0, 2, 2, 0, 0, 1, 30, 0, 0))
    p = tmp_path / "empty_frame.png"
    # fcTL but no IDAT at all
    p.write_bytes(sig + ihdr + actl + fctl + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt/missing compressed"):
        read_apng(p)
    # IDAT present but its bytes are not a zlib stream
    idat = png_chunk(b"IDAT", b"\xff\xfe\xfd\xfc")
    p.write_bytes(sig + ihdr + actl + fctl + idat + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt/missing compressed"):
        read_apng(p)


def test_apng_reader_zero_delay_num(tmp_path):
    """Spec-legal delay_num=0 ('as fast as possible') → the browser-
    implied 100 fps, not ZeroDivisionError (ADVICE round 4)."""
    import struct
    import zlib as _zlib

    from emspec.render.png import png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    actl = png_chunk(b"acTL", struct.pack(">II", 1, 0))
    fctl = png_chunk(b"fcTL", struct.pack(">IIIIIHHBB",
                                          0, 2, 2, 0, 0, 0, 100, 0, 0))
    raw = b"".join(b"\x00" + b"\x01" * 8 for _ in range(2))  # 2 scanlines
    idat = png_chunk(b"IDAT", _zlib.compress(raw))
    p = tmp_path / "zero_delay.png"
    p.write_bytes(sig + ihdr + actl + fctl + idat + png_chunk(b"IEND", b""))
    frames, fps = read_apng(p)
    assert frames.shape == (1, 2, 2, 4)
    assert fps == 100.0


def test_animate_api_rejects_wrong_channel_count():
    from emspec.config import Settings
    from emspec.render.animate import animate_frames

    s = Settings(fft_size=1024, multires=False, channels=3)
    with pytest.raises(ValueError, match="channels"):
        next(animate_frames(np.zeros((2, 4096), np.float32), s, fps=10))


def _tiny_apng_bytes(num, den, w=2, h=2, n_frames=1, real_payload=True):
    """Hand-built APNG; ``real_payload=False`` writes empty zlib streams
    (fine for tests of guards that fire before decompression)."""
    import struct
    import zlib as _zlib

    from emspec.render.png import png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
    actl = png_chunk(b"acTL", struct.pack(">II", n_frames, 0))
    raw = (b"".join(b"\x00" + b"\x01" * (4 * w) for _ in range(h))
           if real_payload else b"")
    seq = 0
    body = b""
    for i in range(n_frames):
        body += png_chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, num, den, 0, 0))
        seq += 1
        if i == 0:
            body += png_chunk(b"IDAT", _zlib.compress(raw))
        else:
            body += png_chunk(b"fdAT", struct.pack(">I", seq)
                              + _zlib.compress(raw))
            seq += 1
    return sig + ihdr + actl + body + png_chunk(b"IEND", b"")


def test_apng_reader_zero_delay_den(tmp_path):
    """Spec: a zero delay denominator means 1/100-second units, so
    (num=4, den=0) is 4/100 s per frame = 25 fps — not 0.0 fps (which
    re-encoding via write_apng would turn into ZeroDivisionError)."""
    p = tmp_path / "zero_den.png"
    p.write_bytes(_tiny_apng_bytes(num=4, den=0))
    frames, fps = read_apng(p)
    assert frames.shape == (1, 2, 2, 4)
    assert fps == 25.0


def test_apng_reader_bounds_total_allocation(tmp_path):
    """check_dims bounds ONE frame; a crafted acTL x a large canvas must
    be rejected before the frames list + np.stack drive a multi-GB
    allocation from a few-KB file (decoder fuzz contract).  1024x65535
    RGBA ~ 0.27 GB/frame passes the single-frame cap; 100 declared
    frames ~ 27 GB total must not."""
    import pytest as _pytest
    p = tmp_path / "bomb.png"
    p.write_bytes(_tiny_apng_bytes(num=1, den=30, w=1024, h=65535,
                                   n_frames=100, real_payload=False))
    with _pytest.raises(ValueError, match="total animation size"):
        read_apng(p)
