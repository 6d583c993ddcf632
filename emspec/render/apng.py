"""Dependency-free APNG writer/reader: the scrolling display as a file.

The reference's product is an *animated* scrolling spectrogram window
(README.md:35-39 "the spectrogram will automatically start visualizing");
the rebuild's static PNG renders capture only one instant of it.  This
module serializes the waterfall's motion itself: a sequence of full RGBA
rasters at a display frame rate, written as an APNG (plays in every
major browser and most image viewers, degrades to the first frame
elsewhere).  Stdlib ``zlib`` + ``struct`` only, same as
:mod:`emspec.render.png`.

Format (PNG third extension, "APNG"): an ``acTL`` chunk after IHDR
declares the frame count; each frame is an ``fcTL`` control chunk
followed by the pixel data — plain ``IDAT`` for frame 0, ``fdAT``
(sequence number + IDAT payload) for the rest.  ``fcTL`` and ``fdAT``
share one monotone sequence counter.  We always write full-canvas
frames (dispose NONE, blend SOURCE) so every frame is independently the
exact raster the live display showed — no delta encoding to second-guess
in tests or downstream tools.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

from emspec.render.png import filter0_scanlines, png_chunk

_SIG = b"\x89PNG\r\n\x1a\n"


def _delay_fraction(fps: float) -> tuple[int, int]:
    """fps → (delay_num, delay_den) u16 rational seconds-per-frame."""
    if not fps > 0:
        raise ValueError(f"fps must be positive, got {fps}")
    if float(fps).is_integer() and 1 <= int(fps) <= 65535:
        return 1, int(fps)
    num = max(1, round(1000.0 / fps))
    if num > 65535:
        raise ValueError(f"fps {fps} too slow for APNG u16 delay")
    return num, 1000




def apng_bytes(frames, fps: float = 30.0, loops: int = 0) -> bytes:
    """Serialize frames — (n, H, W, 4|3) uint8 array or a list/iterable
    of (H, W, 4|3) uint8 images, all the same shape — as APNG bytes
    playing at ``fps`` (``loops=0`` = loop forever, the live-display
    analog).  Frames are compressed one at a time as the iterable
    yields them (the shell's /api/record streams live snapshots through
    here without ever holding the raw stack)."""
    num, den = _delay_fraction(fps)
    it = iter(np.asarray(frames)) if isinstance(frames, np.ndarray) else iter(frames)
    shape = None
    seq = 0
    # chunk list + one join: += bytes is O(n²) in total output size —
    # measurable memcpy for long /api/record captures (ADVICE round 4)
    body: list[bytes] = []
    n_frames = 0
    for img in it:
        img = np.asarray(img)
        if shape is None:
            if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (3, 4):
                raise ValueError(
                    f"expected (H,W,3|4) uint8 frames, got {img.shape} {img.dtype}")
            shape = img.shape
        elif img.shape != shape or img.dtype != np.uint8:
            raise ValueError(
                f"frame {n_frames} shape {img.shape} {img.dtype} != "
                f"first frame {shape} uint8")
        h, w, _ = shape
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, num, den, 0, 0)
        seq += 1
        body.append(png_chunk(b"fcTL", fctl))
        data = zlib.compress(filter0_scanlines(img), 6)
        if n_frames == 0:
            body.append(png_chunk(b"IDAT", data))
        else:
            body.append(png_chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
        n_frames += 1
    if n_frames == 0:
        raise ValueError("write_apng needs at least one frame")
    h, w, c = shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if c == 4 else 2, 0, 0, 0)
    return b"".join([_SIG,
                     png_chunk(b"IHDR", ihdr),
                     png_chunk(b"acTL", struct.pack(">II", n_frames, loops))]
                    + body
                    + [png_chunk(b"IEND", b"")])


def write_apng(path: str | Path, frames, fps: float = 30.0,
               loops: int = 0) -> None:
    """:func:`apng_bytes` to a file."""
    Path(path).write_bytes(apng_bytes(frames, fps, loops))


def read_apng(path: str | Path) -> tuple[np.ndarray, float]:
    """Read an APNG written by :func:`write_apng` back to
    ``((n, H, W, C) uint8, fps)``.  Validates chunk CRCs, the acTL frame
    count, and fcTL/fdAT sequence-number contiguity — strict enough that
    a file passing here is a spec-valid APNG for real viewers."""
    data = Path(path).read_bytes()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG")
    pos = 8
    w = h = c = None
    n_declared = None
    delays: list[tuple[int, int]] = []
    frame_data: list[bytes] = []
    seqs: list[int] = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(data):
            raise ValueError(f"{path}: truncated chunk {tag!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"{path}: bad CRC on chunk {tag!r}")
        # length-validate before unpacking: a crafted chunk with a valid
        # CRC but the wrong body size must be a clean ValueError, not a
        # struct.error leaking out of the decoder
        expect = {b"IHDR": 13, b"acTL": 8, b"fcTL": 26}.get(tag)
        if expect is not None and ln != expect:
            raise ValueError(f"{path}: chunk {tag!r} has {ln} bytes, "
                             f"expected {expect}")
        if tag == b"fdAT" and ln < 4:
            raise ValueError(f"{path}: fdAT shorter than its sequence number")
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", body[:10])
            if depth != 8 or color not in (2, 6):
                raise ValueError(f"{path}: unsupported PNG (not write_apng output)")
            c = 4 if color == 6 else 3
        elif tag == b"acTL":
            n_declared, _loops = struct.unpack(">II", body)
        elif tag == b"fcTL":
            seq, fw, fh, x0, y0, num, den, dispose, blend = struct.unpack(
                ">IIIIIHHBB", body)
            if w is None:
                raise ValueError(f"{path}: fcTL before IHDR")
            if (fw, fh, x0, y0) != (w, h, 0, 0):
                raise ValueError(f"{path}: sub-canvas frame (not write_apng output)")
            seqs.append(seq)
            delays.append((num, den))
            frame_data.append(b"")
        elif tag == b"IDAT":
            if not frame_data:
                raise ValueError(f"{path}: IDAT before first fcTL")
            frame_data[-1] += body
        elif tag == b"fdAT":
            if not frame_data:
                raise ValueError(f"{path}: fdAT before first fcTL")
            (seq,) = struct.unpack(">I", body[:4])
            seqs.append(seq)
            frame_data[-1] += body[4:]
        pos += 12 + ln
    if w is None or n_declared is None or not frame_data:
        raise ValueError(f"{path}: missing IHDR/acTL/frames — not an APNG")
    if n_declared != len(frame_data):
        raise ValueError(
            f"{path}: acTL declares {n_declared} frames, found {len(frame_data)}")
    if seqs != list(range(len(seqs))):
        raise ValueError(f"{path}: non-contiguous APNG sequence numbers {seqs}")
    from emspec.render.png import check_dims, decompress_exact

    expected = check_dims(w, h, c, str(path))
    if len(frame_data) * expected > (1 << 31):
        # check_dims bounds ONE frame; a crafted acTL times a large
        # canvas must not drive a multi-GB total allocation across the
        # frames list + np.stack (decoder fuzz contract)
        raise ValueError(f"{path}: implausible total animation size "
                         f"{len(frame_data)}x{expected} bytes")
    stride = 1 + w * c
    frames = []
    for i, blob in enumerate(frame_data):
        # bounded, exact decompress: empty blobs (fcTL with no
        # IDAT/fdAT), corrupt streams, and decompression bombs are all
        # the documented clean ValueError (ADVICE round 4 + VERDICT #5)
        raw = decompress_exact(blob, expected, f"{path}: frame {i}")
        arr = np.frombuffer(raw, np.uint8).reshape(h, stride)
        if np.any(arr[:, 0] != 0):
            raise ValueError(f"{path}: non-zero PNG filter (not write_apng output)")
        frames.append(arr[:, 1:].reshape(h, w, c))
    num, den = delays[0]
    if num == 0:
        # spec-legal "render as fast as possible": browsers clamp a zero
        # delay to ~10 ms — report that implied rate instead of dividing
        # by zero (ADVICE round 4)
        return np.stack(frames), 100.0
    if den == 0:
        den = 100   # APNG spec: a zero denominator means 1/100 s units
    return np.stack(frames), den / num
