"""Application controller: the reference's app shell minus the GUI (L5/L6).

Realizes the settings-change call stack of SURVEY.md §3.3:

* continuous params (gain, dB range, gate, smoothing, AGC strength,
  brightness, low-end boost, freq scale, colormap, scroll speed) take
  effect next hop with **no recompile** — the controller just rebuilds the
  ``PipelineParams`` pytree;
* structural params (FFT size, mode, multires, channels, sample rate)
  re-specialize: the controller swaps in a new Stream whose executable was
  ideally pre-warmed (``prewarm``), carrying the display over;
* presets Add/Edit/Delete persist JSON (README.md:16);
* Enhanced/Natural toggle switches the reassignment branch;
* the Max-for-Live ``live_state.json`` watcher pauses/resumes the stream
  (docs/MAX-FOR-LIVE.md).

The product boundary stays the RGBA raster: ``app.image()`` is what a
window would blit (reference README.md:35-39).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from emspec.config import PresetStore, Settings, is_structural_change
from emspec.integrations.live_state import LiveStateWatcher
from emspec.post.colormap import lut
from emspec.render.waterfall import Waterfall
from emspec.stream import Stream
from emspec.utils.notes import describe_frequency


class EmSpecApp:
    """Headless application driver over the streaming pipeline."""

    def __init__(self, settings: Settings | None = None,
                 user_dir: str | Path = ".emspec",
                 prewarm_sizes: tuple | None = None):
        self.user_dir = Path(user_dir)
        self.presets = PresetStore(self.user_dir / "presets.json")
        self.settings = settings or self.presets.get("Default")
        self.stream = Stream(self.settings)
        self.waterfall = Waterfall(self.settings.raster_width,
                                   self.settings.raster_height,
                                   self.settings.scroll_speed,
                                   lut_table=lut(self.settings.colormap))
        # optional window-shell hooks: a native window registers these to
        # mirror Ableton's Info View with a real minimize/restore
        # (docs/MAX-FOR-LIVE.md); the stream pause/resume happens first
        # either way.  Bound handlers late-bind self.stream, so structural
        # swaps need no watcher rebinding.
        self.on_minimized = None
        self.on_restored = None
        self.watcher = LiveStateWatcher(
            self.user_dir / "live_state.json",
            on_minimized=self._handle_minimized,
            on_restored=self._handle_restored)
        self._warm_future = None
        if prewarm_sizes:
            from emspec.pipeline import prewarm
            self._warm_future = prewarm(self.settings, prewarm_sizes)

    # ------------------------------------------------------------- audio in
    def push_audio(self, samples: np.ndarray) -> int:
        """Feed captured samples; paints finished columns into the
        waterfall. Returns the number of columns painted."""
        self.watcher.poll()
        cols = self.stream.push(samples)
        ch = self.settings.display_channel
        for c in cols:
            # single-view display (like the reference); display_channel is
            # a continuous setting — switching channels is a host-side
            # slice, never a recompile (tiled multi-channel output lives in
            # the render CLI: ``--channel all``)
            one = c.rgba.ndim == 2
            self.waterfall.add_column(
                c.rgba if one else c.rgba[ch],
                c.vis if one else c.vis[ch])
        return len(cols)

    def image(self) -> np.ndarray:
        """(rows, width, 4) uint8 — what a window would blit."""
        return self.waterfall.image()

    # ------------------------------------------------------------ shutdown
    def close(self) -> None:
        """Abandon background work (queued prewarm compiles) so process
        exit isn't held hostage by the rest of the FFT-size dropdown."""
        if self._warm_future is not None:
            self._warm_future.cancel()
            self._warm_future = None

    # ------------------------------------------------------- window mirror
    def _handle_minimized(self) -> None:
        self.stream.pause()
        if self.on_minimized is not None:
            self.on_minimized()

    def _handle_restored(self) -> None:
        self.stream.resume()
        if self.on_restored is not None:
            self.on_restored()

    # ------------------------------------------------------------- settings
    def apply_settings(self, new: Settings) -> str:
        """Apply a settings change the way the reference panel does
        (SURVEY.md §3.3). Returns "continuous" | "structural" | "noop"."""
        old = self.settings
        if new == old:
            return "noop"
        # exception safety: build everything the new settings need
        # BEFORE mutating any of self — if construction raises (a value
        # the Settings validation didn't anticipate), the app keeps
        # running on its old, consistent state instead of being left
        # half-applied (found by a hostile-settings barrage: a
        # construction-time error used to land after ``self.settings``
        # was already swapped)
        if is_structural_change(old, new):
            # re-specialize: fresh stream (pre-warmed executables make this
            # stall-free), fresh display geometry if it changed
            stream = Stream(new)
            if (new.raster_width != old.raster_width
                    or new.raster_height != old.raster_height):
                waterfall = Waterfall(new.raster_width, new.raster_height,
                                      new.scroll_speed,
                                      lut_table=lut(new.colormap))
            else:
                waterfall = self.waterfall
            if self.stream._paused:
                stream.pause()
            self.settings = new
            self.stream = stream
            self.waterfall = waterfall
            self.waterfall.scroll_speed = new.scroll_speed
            self.waterfall.lut_table = lut(new.colormap)
            return "structural"
        # continuous: swap the params pytree in place — next hop sees it
        params = self.stream.pipe.params(new)
        table = lut(new.colormap)                      # LUT is data
        self.settings = new
        self.stream.params = params
        self.waterfall.scroll_speed = new.scroll_speed
        self.waterfall.lut_table = table
        return "continuous"

    def set(self, **changes) -> str:
        """Slider-style convenience: ``app.set(gain=5.0)``."""
        return self.apply_settings(self.settings.replace(**changes))

    # -------------------------------------------------------------- presets
    def save_preset(self, name: str) -> None:
        self.presets.add(name, self.settings)

    def load_preset(self, name: str) -> str:
        return self.apply_settings(self.presets.get(name))

    def delete_preset(self, name: str) -> None:
        self.presets.delete(name)

    # ---------------------------------------------------------------- hover
    def hover(self, row: int) -> str:
        """Shift+hover readout for a display row (README.md:39).

        Computed from the *current* settings, not the pipeline's
        construction-time tables — Freq Scale is a continuous slider, so
        the zoom may have moved since the pipeline was built."""
        from emspec.dsp.multires import log_freq_axis
        s = self.settings
        freqs = log_freq_axis(s.raster_height, s.freq_min, s.freq_max,
                              s.freq_scale)
        return describe_frequency(float(freqs[row]))

    def axis_ticks(self) -> list:
        """Frequency-ruler ticks for the display's log axis at the
        CURRENT zoom (Freq Scale is continuous — recomputed per call,
        never cached against the pipeline).  Returns
        ``[{"frac": 0..1 bottom→top, "label": "1 kHz"}, …]`` at round
        frequency landmarks that fall inside the visible axis."""
        from emspec.dsp.multires import log_freq_axis
        s = self.settings
        freqs = log_freq_axis(s.raster_height, s.freq_min, s.freq_max,
                              s.freq_scale)
        f0, f1 = float(freqs[0]), float(freqs[-1])
        lo, hi = (f0, f1) if f1 > f0 else (f1, f0)
        ticks = []
        for f in (20, 30, 50, 100, 200, 300, 500, 1_000, 2_000, 3_000,
                  5_000, 10_000, 20_000, 40_000, 80_000):
            if not (lo <= f <= hi):
                continue
            frac = (np.log2(f) - np.log2(f0)) / (np.log2(f1) - np.log2(f0))
            if not (0.0 <= frac <= 1.0):
                continue
            label = (f"{f // 1000} kHz" if f >= 1000 else f"{f} Hz")
            ticks.append({"frac": round(float(frac), 5), "label": label})
        # thin to ≤ 9 ticks so labels never collide at narrow zooms
        while len(ticks) > 9:
            ticks = ticks[::2]
        return ticks
