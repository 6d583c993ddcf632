"""Seeded decoder-robustness fuzz (round 5; VERDICT r4 #5).

The reference is a desktop app fed arbitrary user files
[OBS: README.md:35-39]; the rebuild's decoders (``read_wav``,
``read_png``, ``read_apng``) therefore carry a hard contract: ANY input
bytes either parse or raise the documented ``ValueError`` — no hangs,
no MemoryError, no uncaught struct.error / zlib.error / EOFError, and
no header field (lying chunk length, huge dimensions, decompression
bomb) may drive a multi-GB allocation or an unbounded loop.

Random mutations cover the cases nobody thought of; the targeted tests
pin the named attack classes (bombs, lying lengths, zero dims).
"""

import struct
import zlib

import numpy as np
import pytest

from emspec.io.wav import read_wav, write_wav
from emspec.render.apng import read_apng, write_apng
from emspec.render.png import png_chunk, read_png, write_png

_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------- valid seeds
def _seed_wav_pcm16() -> bytes:
    import io
    import wave

    x = (0.4 * np.sin(np.arange(400) / 5.0)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(np.stack([x, x]).T.ravel().astype("<f4")
                      .clip(-1, 1).__mul__(32767).astype("<i2").tobytes())
    return buf.getvalue()


def _seed_wav_f32() -> bytes:
    """IEEE-float32 WAV built by hand (stdlib wave can't write tag 3)."""
    x = (0.3 * np.sin(np.arange(300) / 7.0)).astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48_000, 48_000 * 4, 4, 32)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(x)) + x)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _seed_png() -> bytes:
    import io

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (9, 7, 4), dtype=np.uint8)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        write_png(f.name, img)
        return open(f.name, "rb").read()


def _seed_apng() -> bytes:
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 255, (3, 6, 5, 4), dtype=np.uint8)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        write_apng(f.name, frames, fps=20)
        return open(f.name, "rb").read()


_CASES = {
    "wav_pcm16": (_seed_wav_pcm16, read_wav),
    "wav_f32": (_seed_wav_f32, read_wav),
    "png": (_seed_png, read_png),
    "apng": (_seed_apng, read_apng),
}


# --------------------------------------------------------------- the fuzz
@pytest.mark.parametrize("fmt", sorted(_CASES))
def test_decoder_fuzz_random_mutations(fmt, tmp_path):
    """~300 seeded mutations per format: byte flips, truncations, random
    4-byte big-endian field lies, slice deletions.  Every one must parse
    or raise ValueError."""
    make, reader = _CASES[fmt]
    valid = make()
    rng = np.random.default_rng(2026)
    p = tmp_path / f"fuzz.{fmt}"
    # the untouched seed must parse (the fuzz is meaningless otherwise)
    p.write_bytes(valid)
    reader(p)
    n_parsed = n_raised = 0
    for i in range(300):
        data = bytearray(valid)
        kind = i % 4
        if kind == 0:                      # flip 1-8 random bytes
            for _ in range(int(rng.integers(1, 9))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        elif kind == 1:                    # truncate
            data = data[: int(rng.integers(0, len(data)))]
        elif kind == 2:                    # lying 4-byte field (lengths/dims)
            off = int(rng.integers(0, max(len(data) - 4, 1)))
            data[off:off + 4] = struct.pack(
                ">I", int(rng.choice([0, 1, 0xFFFF, 0x7FFFFFFF,
                                      0xFFFFFFFF])))
        else:                              # delete a random slice
            a = int(rng.integers(0, len(data)))
            b = min(len(data), a + int(rng.integers(1, 64)))
            del data[a:b]
        p.write_bytes(bytes(data))
        try:
            reader(p)
            n_parsed += 1
        except ValueError:
            n_raised += 1
        # anything else (struct.error, zlib.error, EOFError, MemoryError,
        # RecursionError, numpy non-ValueError...) propagates = test fails
    assert n_raised > 50, f"mutations barely exercised error paths " \
                          f"({n_raised} raised / {n_parsed} parsed)"


# ----------------------------------------------------------- targeted pins
def test_png_decompression_bomb_rejected(tmp_path):
    """A few-KB IDAT expanding to 64 MB against a 4×4 header must raise
    ValueError without materializing the payload (the decompress is
    capped at the header-implied size BEFORE allocation)."""
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
    bomb = png_chunk(b"IDAT", zlib.compress(bytes(64 << 20), 9))
    p = tmp_path / "bomb.png"
    p.write_bytes(_SIG + ihdr + bomb + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decompressed size"):
        read_png(p)


def test_apng_decompression_bomb_rejected(tmp_path):
    """Same bomb through the (CRC-validated) APNG frame path."""
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
    actl = png_chunk(b"acTL", struct.pack(">II", 1, 0))
    fctl = png_chunk(b"fcTL", struct.pack(">IIIIIHHBB",
                                          0, 4, 4, 0, 0, 1, 30, 0, 0))
    bomb = png_chunk(b"IDAT", zlib.compress(bytes(64 << 20), 9))
    p = tmp_path / "bomb_a.png"
    p.write_bytes(_SIG + ihdr + actl + fctl + bomb + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decompressed size"):
        read_apng(p)


def test_png_implausible_dimensions_rejected(tmp_path):
    """Header-claimed huge/zero dimensions must be rejected before they
    size any loop or allocation (pre-fix: a 2³¹-row header span a
    2³¹-iteration Python loop)."""
    for w, h in ((1 << 24, 1 << 24), (0xFFFFFFFF, 2), (0, 4), (4, 0)):
        ihdr = png_chunk(b"IHDR",
                         struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        idat = png_chunk(b"IDAT", zlib.compress(b"\x00" * 16))
        p = tmp_path / "dims.png"
        p.write_bytes(_SIG + ihdr + idat + png_chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="implausible|decompressed"):
            read_png(p)


def test_png_truncated_and_lying_chunk_length(tmp_path):
    """A chunk length field pointing past EOF is a clean truncation
    error, not struct.error or a silent mis-parse."""
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
    lying = struct.pack(">I", 0x7FFFFFFF) + b"IDAT" + b"\x00" * 8
    p = tmp_path / "lie.png"
    p.write_bytes(_SIG + ihdr + lying)
    with pytest.raises(ValueError, match="truncated"):
        read_png(p)


def test_wav_lying_data_size_and_short_fmt(tmp_path):
    """WAV chunk-size lies: a data size past EOF decodes the available
    bytes or errors cleanly; a short fmt chunk is ValueError, not
    struct.error."""
    # data csize 0xFFFFFFF0 — only 12 real bytes follow
    fmt = struct.pack("<HHIIHH", 1, 1, 48_000, 96_000, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x01\x02" * 6)
    p = tmp_path / "lie.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    try:
        audio, rate = read_wav(p)
        assert rate == 48_000 and np.isfinite(audio).all()
    except ValueError:
        pass
    # fmt chunk claiming 16 bytes but holding 4
    body2 = (b"WAVEfmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    with pytest.raises(ValueError):
        read_wav(p)
