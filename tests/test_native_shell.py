"""Native tkinter window shell tests (the reference's frameless
always-on-top desktop window — README.md:13,35-39).

This box is headless, so the full window logic is driven through a fake
tk module handle: frameless setup, true -topmost binding to the on_top
setting, drag-to-move geometry math, Shift+hover readout, live_state.json
minimize/restore mirroring, and the PPM blit encoding (verified
byte-exactly, Tk-independent)."""

import json
from types import SimpleNamespace

import numpy as np
import pytest

from emspec.app import EmSpecApp
from emspec.config import Settings
from emspec.integrations.live_state import write_state
from emspec.shell.native import NativeWindow, hover_row, rgba_to_ppm


# --------------------------------------------------------------- fake tk
class FakeWidget:
    def __init__(self, master=None, **kw):
        self.config = dict(kw)
        self.bindings = {}

    def pack(self, **kw):
        pass

    def configure(self, **kw):
        self.config.update(kw)

    def bind(self, seq, fn):
        self.bindings[seq] = fn


class FakeRoot(FakeWidget):
    def __init__(self):
        super().__init__()
        self.attrs = {}
        self.frameless = None
        self.geometry_calls = []
        self.after_queue = []
        self.withdrawn = False
        self.destroyed = False
        self.looped = False
        self.titled = None

    def title(self, t):
        self.titled = t

    def overrideredirect(self, flag):
        self.frameless = flag

    def wm_attributes(self, name, value):
        self.attrs[name] = value

    def geometry(self, spec):
        self.geometry_calls.append(spec)

    def after(self, ms, fn):
        self.after_queue.append(fn)

    def withdraw(self):
        self.withdrawn = True

    def deiconify(self):
        self.withdrawn = False

    def destroy(self):
        self.destroyed = True

    def mainloop(self):
        self.looped = True


class FakePhotoImage:
    def __init__(self, data=b""):
        self.data = data


def fake_tk():
    return SimpleNamespace(Tk=FakeRoot, Label=FakeWidget,
                           PhotoImage=FakePhotoImage, TclError=RuntimeError)


def event(**kw):
    base = dict(x=0, y=0, x_root=0, y_root=0, state=0)
    base.update(kw)
    return SimpleNamespace(**base)


@pytest.fixture()
def win(tmp_path):
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=64, raster_width=96, hop=256)
    app = EmSpecApp(s, user_dir=tmp_path / "userdir")
    return NativeWindow(app, tk=fake_tk())


# ------------------------------------------------------------- pure parts
def test_rgba_to_ppm_bytes():
    img = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    ppm = rgba_to_ppm(img)
    assert ppm.startswith(b"P6 3 2 255\n")
    body = ppm.split(b"\n", 1)[1]
    # alpha (every 4th byte) dropped, order preserved
    assert body == bytes(v for i, v in enumerate(img.ravel()) if i % 4 != 3)
    with pytest.raises(ValueError):
        rgba_to_ppm(img.astype(np.float32))


def test_hover_row_orientation():
    # top of the window = highest display row (same as the web shell)
    assert hover_row(0, 100, 64) == 63
    assert hover_row(100, 100, 64) == 0
    assert hover_row(50, 100, 63) == 31
    assert hover_row(0, 0, 64) == 0          # degenerate geometry


# ---------------------------------------------------------- window duties
def test_frameless_and_on_top_binding(win):
    assert win.root.frameless is True
    assert win.root.attrs["-topmost"] == (1 if win.app.settings.on_top else 0)
    before = win.app.settings.on_top
    win.root.bindings["t"](event())
    assert win.app.settings.on_top is (not before)
    assert win.root.attrs["-topmost"] == (1 if not before else 0)


def test_drag_moves_window(win):
    lbl = win.image_label
    lbl.bindings["<Button-1>"](event(x=5, y=7))
    lbl.bindings["<B1-Motion>"](event(x_root=100, y_root=50))
    assert win.root.geometry_calls[-1] == "+95+43"
    # motion without a press must not move the window
    win2_calls = len(win.root.geometry_calls)
    win._drag_origin = None
    lbl.bindings["<B1-Motion>"](event(x_root=1, y_root=1))
    assert len(win.root.geometry_calls) == win2_calls


def test_shift_hover_readout(win):
    lbl = win.image_label
    lbl.bindings["<Motion>"](event(y=0, state=0))
    assert "Hz" not in win.status.config["text"]    # no Shift: untouched
    lbl.bindings["<Motion>"](event(y=0, state=1))   # Shift at window top
    text = win.status.config["text"]
    assert "Hz" in text
    assert win.app.hover(win.app.settings.raster_height - 1) == text


def test_live_state_minimize_restore(win, tmp_path):
    state_file = win.app.watcher.path
    write_state(state_file, "minimized")
    win.app.watcher.poll()
    assert win.root.withdrawn and win.app.stream._paused
    write_state(state_file, "restored")
    win.app.watcher.poll()
    assert not win.root.withdrawn and not win.app.stream._paused


def test_blit_and_tick(win):
    win.blit()
    assert win._photo is not None
    assert win._photo.data.startswith(b"P6 96 64 255\n")
    assert win.image_label.config["image"] is win._photo
    # a tick with audio queued paints and re-arms itself
    rng = np.random.default_rng(0)
    win.app.stream.ring.push(
        rng.standard_normal(8192).astype(np.float32) * 0.2)
    win._photo = None
    tick = win.root.after_queue.pop(0)
    tick()
    assert win._photo is not None                  # columns → re-blit
    assert len(win.root.after_queue) == 1          # re-armed
    win.close()
    assert win.root.destroyed
    win.root.after_queue.pop(0)()                  # pending tick after close
    assert len(win.root.after_queue) == 0          # does not re-arm


def test_mode_keys_switch_pipeline(win):
    win.root.bindings["e"](event())
    assert win.app.settings.mode == "enhanced"
    win.root.bindings["n"](event())
    assert win.app.settings.mode == "natural"
    win.root.bindings["<space>"](event())
    assert win.app.stream._paused
    win.root.bindings["<space>"](event())
    assert not win.app.stream._paused


def test_headless_fallback_raises_cleanly(tmp_path, monkeypatch):
    import sys
    pytest.importorskip("tkinter")
    if sys.platform != "linux":
        pytest.skip("DISPLAY-less Tk failure only deterministic on linux")
    monkeypatch.delenv("DISPLAY", raising=False)
    from emspec.shell.native import NativeUnavailable, run_native
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=64, raster_width=96, hop=256)
    with pytest.raises(NativeUnavailable):
        run_native(s, source="synthetic", user_dir=str(tmp_path / "userdir"))


def test_shift_hover_needs_no_device_fetch(win, monkeypatch):
    """The hover readout must not force a device→host waterfall copy per
    mouse-move event: the label blits the raster 1:1, so the window's
    pixel height IS raster_height and app.image() never needs fetching."""
    def _boom():
        raise AssertionError("hover fetched the whole waterfall image")
    monkeypatch.setattr(win.app, "image", _boom)
    win.image_label.bindings["<Motion>"](event(y=0, state=1))
    assert "Hz" in win.status.config["text"]


def test_missing_tkinter_module_falls_back(tmp_path, monkeypatch):
    """A box without python3-tk must get the documented NativeUnavailable
    (→ web-shell fallback in the CLI), not a ModuleNotFoundError crash."""
    import sys

    from emspec.shell.native import NativeUnavailable, run_native
    monkeypatch.setitem(sys.modules, "tkinter", None)  # import -> ImportError
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=64, raster_width=96, hop=256)
    with pytest.raises(NativeUnavailable):
        run_native(s, source="synthetic", user_dir=str(tmp_path / "userdir"))
