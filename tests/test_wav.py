"""WAV container handling: format-tag-driven decode (ADVICE round-1 fix —
PCM32 vs IEEE float32 is decided by the fmt chunk, not value sniffing),
plus pure-Python reads of containers stdlib ``wave`` rejects."""

import struct

import numpy as np
import pytest

from emspec.io.wav import _read_wav_py, read_wav, write_wav


def _wav_blob(tag: int, bits: int, body: bytes, rate: int = 48_000,
              nch: int = 1) -> bytes:
    width = bits // 8
    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * width * nch,
                      width * nch, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_float32_wav_pure_python(tmp_path):
    """stdlib wave raises 'unknown format: 3'; the manual RIFF fallback
    must decode IEEE float WAVs anyway."""
    x = (0.25 * np.sin(np.arange(500) / 7.0)).astype("<f4")
    p = tmp_path / "f32.wav"
    p.write_bytes(_wav_blob(3, 32, x.tobytes()))
    got, rate = _read_wav_py(p)
    assert rate == 48_000
    np.testing.assert_array_equal(got[0], x)


def test_pcm32_small_values_not_misread_as_float(tmp_path):
    """A quiet PCM32 file whose raw bytes happen to decode to tiny finite
    floats (any int < ~2^30 does) must decode via the PCM path — the fmt
    tag says so (regression for the value-sniffing heuristic)."""
    ints = np.arange(0, 400, dtype="<i4") * 1000       # tiny PCM32 values
    p = tmp_path / "i32.wav"
    p.write_bytes(_wav_blob(1, 32, ints.tobytes()))
    got, rate = _read_wav_py(p)
    want = ints.astype(np.float32) / 2147483648.0
    np.testing.assert_array_equal(got[0], want)
    # sanity: the bytes DO look like valid small floats (the trap is real)
    as_f = ints.view("<f4")
    assert np.all(np.isfinite(as_f)) and np.abs(as_f).max() <= 4.0


def test_extensible_float_wav(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE resolves through the SubFormat GUID."""
    x = (0.1 * np.cos(np.arange(300) / 5.0)).astype("<f4")
    # fmt: tag 0xFFFE, cbSize=22, validbits=32, channelmask, SubFormat GUID
    # whose first 2 bytes carry the real tag (3 = IEEE float)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 48_000, 48_000 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4)
    fmt += struct.pack("<H", 3) + bytes(14)
    body = x.tobytes()
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    p = tmp_path / "ext.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    got, rate = _read_wav_py(p)
    assert rate == 48_000
    np.testing.assert_array_equal(got[0], x)


def test_float64_wav(tmp_path):
    x = 0.5 * np.sin(np.arange(200) / 3.0)
    p = tmp_path / "f64.wav"
    p.write_bytes(_wav_blob(3, 64, x.astype("<f8").tobytes()))
    got, _ = _read_wav_py(p)
    np.testing.assert_allclose(got[0], x.astype(np.float32), atol=0)


def test_write_read_roundtrip_public_api(tmp_path):
    x = 0.9 * np.sin(np.arange(1000) / 11.0).astype(np.float32)
    p = tmp_path / "rt.wav"
    write_wav(p, x, 44_100)
    got, rate = read_wav(p)
    assert rate == 44_100
    # 16-bit quantization (truncation) + the 32767/32768 write/read scale
    np.testing.assert_allclose(got[0], x, atol=1e-4, rtol=0)


def test_write_wav_nonfinite_samples_deterministic(tmp_path):
    """NaN/±Inf samples must write deterministically (NaN → 0, ±Inf →
    full scale), not cast to garbage ints with a RuntimeWarning
    (round-5 non-finite robustness sweep)."""
    import warnings

    x = 0.5 * np.sin(np.arange(500) / 7.0).astype(np.float32)
    x[10], x[20], x[30] = np.nan, np.inf, -np.inf
    p = tmp_path / "nf.wav"
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # any RuntimeWarning fails
        write_wav(p, x, 48_000)
    got, _ = read_wav(p)
    assert np.isfinite(got).all()
    assert got[0, 10] == 0.0
    np.testing.assert_allclose(got[0, 20], 1.0, atol=1e-4)
    np.testing.assert_allclose(got[0, 30], -1.0, atol=1e-4)


def test_write_wav_rejects_samples_major_layout(tmp_path):
    """A (n, channels) array passed by mistake must raise a clear
    ValueError, not a struct overflow deep inside the wave module —
    while genuinely wide (channels, n) captures still write."""
    import pytest
    with pytest.raises(ValueError, match="transpose"):
        write_wav(tmp_path / "bad.wav", np.zeros((1000, 2), np.float32), 48_000)
    with pytest.raises(ValueError, match="transpose"):
        write_wav(tmp_path / "bad.wav", np.zeros((70_000, 8), np.float32), 48_000)
    # a 96-channel mic-array capture is legitimate
    write_wav(tmp_path / "wide.wav", np.zeros((96, 2000), np.float32), 48_000)
    got, _ = read_wav(tmp_path / "wide.wav")
    assert got.shape == (96, 2000)


def _valid_wav_bytes() -> bytes:
    import io, wave as _w
    x = (np.sin(np.arange(2000) / 7.0) * 20000).astype("<i2")
    buf = io.BytesIO()
    with _w.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(np.stack([x, x], 1).tobytes())
    return buf.getvalue()


def test_read_wav_malformed_never_crashes(tmp_path):
    """Fuzz the decode path (native chunk walker when built + Python
    fallback): truncations, corrupt headers, absurd chunk sizes, zero
    channels, exotic bit depths — every mutation must either decode to a
    sane array or raise a clean exception, never crash or hang (the
    native decoder runs in-process, so this test IS the crash detector)."""
    base = bytearray(_valid_wav_bytes())
    rng = np.random.default_rng(23)
    cases = []
    for cut in (0, 3, 11, 12, 20, 36, 43, 44, 45, len(base) - 1):
        cases.append(bytes(base[:cut]))                  # truncations
    for _ in range(40):                                  # random byte flips
        m = bytearray(base)
        for pos in rng.integers(0, len(m), size=int(rng.integers(1, 6))):
            m[pos] = int(rng.integers(0, 256))
        cases.append(bytes(m))
    for val in (0, 1, 7, 12, 20, 64, 65535):             # exotic bit depths
        m = bytearray(base)
        m[34:36] = int(val).to_bytes(2, "little")
        cases.append(bytes(m))
    m = bytearray(base); m[22:24] = b"\x00\x00"          # channels = 0
    cases.append(bytes(m))
    m = bytearray(base); m[16:20] = b"\xff\xff\xff\xff"  # fmt clen = 4 GiB
    cases.append(bytes(m))
    m = bytearray(base); m[40:44] = b"\xff\xff\xff\xff"  # data clen = 4 GiB
    cases.append(bytes(m))

    p = tmp_path / "fuzz.wav"
    for i, blob in enumerate(cases):
        p.write_bytes(blob)
        try:
            data, rate = read_wav(p)
        except Exception as e:                 # clean Python exception only
            assert not isinstance(e, (SystemExit, KeyboardInterrupt))
            continue
        # shape sanity only: a mutation may legitimately flip the header
        # to float32 and decode garbage bytes as inf/nan VALUES — the
        # contract here is decoder safety, not value plausibility
        assert data.ndim == 2 and data.dtype == np.float32, f"case {i}"
        assert 1 <= data.shape[0] <= 65535, f"case {i}"


def test_exotic_bit_depths_rejected_end_to_end(tmp_path):
    """Exotic bit depths (12-bit PCM, float16) must raise a clear error
    through the PUBLIC read_wav — native decoder rejects, and the Python
    fallback must NOT then round them to the nearest byte width and
    decode garbage int16 PCM."""
    for bits, tag, name in ((12, 1, "bits12"), (16, 3, "float16"),
                            (20, 1, "bits20")):
        m = bytearray(_valid_wav_bytes())
        m[20:22] = int(tag).to_bytes(2, "little")
        m[34:36] = int(bits).to_bytes(2, "little")
        p = tmp_path / f"{name}.wav"
        p.write_bytes(bytes(m))
        with pytest.raises(ValueError, match="unsupported"):
            read_wav(p)


def test_write_wav_channels_first_escape_hatch(tmp_path):
    """A legitimately wide-but-short (channels, n) capture asserts its
    layout with channels_first=True; channels_first=False declares
    (n, channels) input and transposes it here (round-3 advisor
    finding: the heuristic alone rejected valid 128ch x 100 buffers)."""
    import pytest
    x = np.zeros((128, 100), np.float32)
    with pytest.raises(ValueError, match="transpose"):
        write_wav(tmp_path / "no.wav", x, 48_000)      # heuristic default
    write_wav(tmp_path / "yes.wav", x, 48_000, channels_first=True)
    got, _ = read_wav(tmp_path / "yes.wav")
    assert got.shape == (128, 100)
    y = np.zeros((1000, 2), np.float32)                # (n, channels)
    write_wav(tmp_path / "t.wav", y, 48_000, channels_first=False)
    got, _ = read_wav(tmp_path / "t.wav")
    assert got.shape == (2, 1000)
    # 1-D is unambiguous mono under ANY declared layout (round-4 review:
    # channels_first=False used to transpose the promoted (1, n) into an
    # n-channel 1-sample file)
    write_wav(tmp_path / "m.wav", np.zeros(1000, np.float32), 48_000,
              channels_first=False)
    got, _ = read_wav(tmp_path / "m.wav")
    assert got.shape == (1, 1000)


def test_zero_sample_rate_rejected(tmp_path):
    """A lying fmt chunk with rate=0 parses on both decode paths but
    ZeroDivides every consumer that paces on samples/rate (feed.py) —
    must be the documented clean ValueError instead."""
    import numpy as np
    import pytest

    from emspec.io.wav import read_wav

    body = (np.zeros(64, np.float32)).tobytes()
    p = tmp_path / "rate0.wav"
    p.write_bytes(_wav_blob(3, 32, body, rate=0))
    with pytest.raises(ValueError, match="sample rate"):
        read_wav(p)
    # the int16 path goes through stdlib wave — same contract
    p2 = tmp_path / "rate0_i16.wav"
    p2.write_bytes(_wav_blob(1, 16, b"\x00\x00" * 64, rate=0))
    with pytest.raises(ValueError, match="sample rate"):
        read_wav(p2)
