"""Terminal renderer tests (the L6 display analog)."""

import io

import numpy as np

from emspec.config import Settings
from emspec.render.terminal import frame_to_ansi, live_view
from emspec.io.wav import write_wav
from emspec.io import synth


def test_frame_to_ansi_shapes_and_colors():
    img = np.zeros((64, 32, 4), np.uint8)
    img[10:20, :, 0] = 200          # a red band
    s = frame_to_ansi(img, cols=16, rows=8)
    assert s.count("\n") == 7       # 8 text rows
    assert "\x1b[38;2;" in s and "\x1b[48;2;" in s and "▀" in s
    assert "200;0;0" in s           # the band's color appears
    assert s.endswith("\x1b[0m")


def test_live_view_streams_whole_file(tmp_path):
    wav = tmp_path / "t.wav"
    write_wav(wav, synth.tone(440.0, 0.2), 48_000)
    s = Settings(multires=True, multires_sizes=(1024, 512),
                 raster_height=64, hop=256)
    buf = io.StringIO()
    n = live_view(str(wav), s, width=64, realtime=False, out=buf)
    out = buf.getvalue()
    assert n > 0
    assert "\x1b[2J" in out          # cleared screen
    assert "\x1b[?25h" in out        # cursor restored at exit
    assert out.count("▀") > 1000     # actually painted pixels
