"""Offline animation of the scrolling waterfall (L4).

The reference's product is the *motion* of the display (README.md:35-39);
:func:`animate_frames` reproduces it deterministically: frame ``k`` is
the waterfall state a live viewer at ``fps`` would see at time
``k / fps`` — i.e. after exactly ``k · sample_rate / fps`` input samples
have been consumed by the real streaming path (:class:`emspec.stream.
Stream` + :class:`emspec.render.waterfall.Waterfall`, the same objects
``emspec stream``/``live``/``gui`` drive).  Everything is inherited, not
re-implemented: emit latency (reassignment reach), scroll-speed
semantics including fractional-speed pre-LUT averaging, the opaque-black
unwritten canvas.  Consequently the LAST frame (after flush) is
bit-identical to ``emspec stream``'s snapshot PNG of the same audio —
pinned by tests/test_animate.py.

Frames stream out of a generator so the APNG writer compresses them one
at a time — a minute of 1024×1024 animation never holds raw frames.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np

from emspec.config import Settings


def frame_count(n_samples: int, sample_rate: int, fps: float) -> int:
    """Number of frames :func:`animate_frames` yields: one per started
    display tick of the audio's duration (≥ 1 for any non-empty audio)."""
    return max(1, math.ceil(n_samples * fps / sample_rate))


def animate_frames(audio: np.ndarray, settings: Settings, fps: float = 30.0,
                   width: int = 1024) -> Iterator[np.ndarray]:
    """Yield (H, W, 4) uint8 display frames of ``audio`` at ``fps``.

    ``audio``: (n,) for one channel, or (channels, n) matching
    ``settings.channels`` for a tiled per-channel view (one waterfall per
    channel, composed with :func:`emspec.render.png.tile_images` exactly
    like ``emspec stream --channel all``).  The final yielded frame
    includes the stream flush (drained reassignment ring)."""
    from emspec.post.colormap import lut
    from emspec.render.png import tile_images
    from emspec.render.waterfall import Waterfall
    from emspec.stream import Stream

    if not fps > 0:
        raise ValueError(f"fps must be positive, got {fps}")
    s = settings
    nch = s.channels
    if (audio.ndim == 2) != (nch > 1) or (audio.ndim == 2
                                          and audio.shape[0] != nch):
        raise ValueError(
            f"audio shape {audio.shape} does not match settings.channels="
            f"{nch} — pass (channels, n) iff channels > 1")
    stream = Stream(s)
    wfs = [Waterfall(width, s.raster_height, s.scroll_speed,
                     lut_table=lut(s.colormap)) for _ in range(nch)]

    def paint(col):
        one = col.rgba.ndim == 2
        for c, wf in enumerate(wfs):
            wf.add_column(col.rgba if one else col.rgba[c],
                          col.vis if one else col.vis[c])

    n = audio.shape[-1]
    n_frames = frame_count(n, s.sample_rate, fps)
    fed = 0
    for k in range(1, n_frames + 1):
        # audio consumed by display time k/fps; the last tick force-feeds
        # the remainder so float rounding can never strand samples
        target = n if k == n_frames else min(
            n, int(round(k * s.sample_rate / fps)))
        if target > fed:
            for col in stream.push(audio[..., fed:target]):
                paint(col)
            fed = target
        if k == n_frames:
            for col in stream.flush():
                paint(col)
        yield tile_images([wf.image() for wf in wfs])
