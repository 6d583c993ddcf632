"""Application-controller tests: the settings-change call stack of
SURVEY.md §3.3 (continuous vs structural), presets, M4L pause, hover."""

from emspec.app import EmSpecApp
from emspec.config import Settings
from emspec.integrations import live_state
from emspec.io import synth

SR = 48_000


def _app(tmp_path, **kw):
    kw.setdefault("multires", True)
    kw.setdefault("multires_sizes", (1024, 512))
    kw.setdefault("raster_height", 64)
    kw.setdefault("raster_width", 32)
    kw.setdefault("hop", 256)
    return EmSpecApp(Settings(**kw), user_dir=tmp_path)


def test_audio_to_image(tmp_path):
    app = _app(tmp_path)
    n = app.push_audio(synth.tone(440.0, 0.3, SR))
    assert n > 0
    img = app.image()
    assert img.shape == (64, 32, 4)
    assert img[..., :3].max() > 0      # something was painted


def test_continuous_change_keeps_stream(tmp_path):
    app = _app(tmp_path)
    stream_before = app.stream
    pipe_before = app.stream.pipe
    assert app.set(gain=9.0, colormap="viridis", db_range=80.0) == "continuous"
    assert app.stream is stream_before          # no re-specialization
    assert app.stream.pipe is pipe_before
    assert app.set(gain=9.0, colormap="viridis", db_range=80.0) == "noop"


def test_structural_change_swaps_stream(tmp_path):
    app = _app(tmp_path)
    app.push_audio(synth.tone(440.0, 0.1, SR))
    stream_before = app.stream
    assert app.set(mode="natural") == "structural"
    assert app.stream is not stream_before
    assert app.push_audio(synth.tone(440.0, 0.1, SR)) > 0  # keeps working


def test_preset_roundtrip(tmp_path):
    app = _app(tmp_path)
    app.set(low_end_boost=7.5)
    app.save_preset("Bass Heavy")
    app.set(low_end_boost=1.0)
    assert app.load_preset("Bass Heavy") == "continuous"
    assert app.settings.low_end_boost == 7.5
    # persisted across app instances
    app2 = _app(tmp_path)
    assert app2.presets.get("Bass Heavy").low_end_boost == 7.5


def test_m4l_pause_resume_via_state_file(tmp_path):
    app = _app(tmp_path)
    live_state.write_state(tmp_path / "live_state.json", "minimized")
    assert app.push_audio(synth.tone(440.0, 0.1, SR)) == 0   # paused
    live_state.write_state(tmp_path / "live_state.json", "restored")
    assert app.push_audio(synth.tone(440.0, 0.1, SR)) > 0


def test_m4l_pause_survives_structural_change(tmp_path):
    app = _app(tmp_path)
    live_state.write_state(tmp_path / "live_state.json", "minimized")
    app.push_audio(synth.tone(440.0, 0.05, SR))              # registers pause
    app.set(mode="natural")                                  # swap stream
    assert app.push_audio(synth.tone(440.0, 0.1, SR)) == 0   # still paused
    live_state.write_state(tmp_path / "live_state.json", "restored")
    assert app.push_audio(synth.tone(440.0, 0.2, SR)) > 0


def test_hover(tmp_path):
    app = _app(tmp_path, raster_height=512)   # fine enough to resolve A4
    row = app.stream.pipe.row_of_frequency(440.0)
    assert "A4" in app.hover(row)
    assert "Hz" in app.hover(0)


def test_scroll_speed_is_continuous(tmp_path):
    app = _app(tmp_path)
    assert app.set(scroll_speed=2.0) == "continuous"
    assert app.waterfall.scroll_speed == 2.0


def test_hover_tracks_continuous_freq_scale(tmp_path):
    """Freq Scale is a continuous slider; the hover readout must follow
    the zoom without a pipeline rebuild."""
    app = _app(tmp_path, raster_height=256)
    top_before = app.hover(255)
    assert app.set(freq_scale=2.0) == "continuous"
    top_after = app.hover(255)
    assert top_before != top_after
    # zoomed top row frequency = geometric mean of the full span
    import math
    f = float(top_after.split(" ")[0])
    expect = math.sqrt(app.settings.freq_min * app.settings.freq_max)
    assert abs(f / expect - 1) < 0.01


def test_multichannel_app_displays_channel_zero(tmp_path):
    import numpy as np
    app = _app(tmp_path, channels=2)
    x = np.stack([synth.tone(440.0, 0.15, SR), synth.tone(880.0, 0.15, SR)])
    assert app.push_audio(x) > 0
    img = app.image()
    assert img.shape == (64, 32, 4)


def test_crossover_change_is_structural(tmp_path):
    """crossovers shape the band-support slices — must re-specialize
    (regression: stale slices left a dark notch in the crossfade)."""
    app = _app(tmp_path)
    assert app.set(crossover_low=500.0) == "structural"
    assert app.set(freq_min=40.0) == "structural"


def test_apply_settings_is_exception_safe(tmp_path, monkeypatch):
    """If constructing the new pipeline raises (a value the Settings
    validation didn't anticipate), the app must keep running on its
    old, consistent state — not be left with new settings and an old
    stream (found by a hostile-settings barrage: ``self.settings`` used
    to be swapped before ``Stream(new)`` could fail)."""
    import pytest

    import emspec.app as app_mod

    app = _app(tmp_path)
    old_settings, old_stream = app.settings, app.stream

    def boom(_settings, *a, **kw):
        raise RuntimeError("construction-time failure")

    monkeypatch.setattr(app_mod, "Stream", boom)
    with pytest.raises(RuntimeError):
        app.set(fft_size=512)           # structural -> hits the boom
    assert app.settings == old_settings
    assert app.stream is old_stream
    monkeypatch.undo()
    # still alive: a real change works, audio still paints
    assert app.set(gain=9.0) == "continuous"
    assert app.push_audio(synth.tone(440.0, 0.3, SR)) > 0
