"""Window-shell analog tests (VERDICT #4): every shell duty exercised
headlessly over HTTP — live raster, settings panel with the interactive
continuous-vs-structural contract, Shift+hover tooltip, preset CRUD,
On-Top flag, and M4L minimize/restore wired through the real
live_state.json watcher."""

import json
import time
import urllib.request

import numpy as np
import pytest

from emspec.config import Settings
from emspec.shell import ShellServer


@pytest.fixture()
def shell(tmp_path):
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=128, raster_width=256, hop=256)
    srv = ShellServer(s, port=0, source="synthetic",
                      user_dir=tmp_path / "userdir")
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}",
                                timeout=10) as r:
        return r.read()


def _post(srv, path, payload=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload or {}).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_page_and_meta(shell):
    page = _get(shell, "/").decode()
    assert "<canvas" in page and "Freq Scale" in page
    meta = json.loads(_get(shell, "/api/meta"))
    assert 4096 in meta["fft_sizes"] and "inferno" in meta["colormaps"]
    assert meta["version"]


def test_frame_updates_live(shell):
    def grab():
        raw = _get(shell, "/api/frame")
        h = int.from_bytes(raw[:4], "big")
        w = int.from_bytes(raw[4:8], "big")
        return np.frombuffer(raw[8:], np.uint8).reshape(h, w, 4)
    time.sleep(1.0)                    # let capture fill some columns
    a = grab()
    assert a.shape == (128, 256, 4)
    time.sleep(0.8)
    b = grab()
    assert a.any() or b.any()
    assert not np.array_equal(a, b)    # the display is actually scrolling


def test_settings_contract_over_http(shell):
    """The no-recompile contract, interactively: sliders report
    'continuous', FFT size reports 'structural' (SURVEY.md §3.3)."""
    r = _post(shell, "/api/settings", {"gain": 9.0})
    assert r["kind"] == "continuous" and r["settings"]["gain"] == 9.0
    r = _post(shell, "/api/settings", {"colormap": "viridis"})
    assert r["kind"] == "continuous"
    r = _post(shell, "/api/settings", {"fft_size": 2048})
    assert r["kind"] == "structural"
    r = _post(shell, "/api/settings", {"fft_size": 2048})
    assert r["kind"] == "noop"
    # invalid values surface as HTTP 400, not a dead shell
    with pytest.raises(urllib.error.HTTPError):
        _post(shell, "/api/settings", {"colormap": "rainbow"})
    assert json.loads(_get(shell, "/api/settings"))["fft_size"] == 2048


def test_hover_tooltip(shell):
    txt = _get(shell, "/api/hover?frac=0.5").decode()
    assert "Hz" in txt and "¢" in txt
    # garbage / non-finite params: clean 400 or a safe default, never a
    # dropped connection from an unhandled ValueError in the handler
    with pytest.raises(urllib.error.HTTPError):
        _get(shell, "/api/hover?frac=abc")
    assert b"Hz" in _get(shell, "/api/hover?frac=nan")
    assert b"Hz" in _get(shell, "/api/hover?frac=inf")


def test_on_top_flag(shell):
    _post(shell, "/api/settings", {"on_top": True})
    st = json.loads(_get(shell, "/api/state"))
    assert st["on_top"] is True


def test_preset_crud_over_http(shell):
    _post(shell, "/api/settings", {"gain": 5.5})
    _post(shell, "/api/preset/save?name=Web")
    names = json.loads(_get(shell, "/api/presets"))
    assert "Web" in names
    _post(shell, "/api/settings", {"gain": 1.0})
    r = _post(shell, "/api/preset/load?name=Web")
    assert r["settings"]["gain"] == 5.5
    _post(shell, "/api/preset/delete?name=Web")
    assert "Web" not in json.loads(_get(shell, "/api/presets"))
    with pytest.raises(urllib.error.HTTPError):
        _post(shell, "/api/preset/delete?name=Default")


def test_multichannel_shell_channel_switch(tmp_path):
    """A multichannel session exposes display_channel as a continuous
    change over HTTP, and the page's selector data round-trips."""
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=64, raster_width=128, hop=256, channels=3)
    srv = ShellServer(s, port=0, source="synthetic",
                      user_dir=tmp_path / "ud")
    srv.start()
    try:
        time.sleep(0.8)
        r = _post(srv, "/api/settings", {"display_channel": 2})
        assert r["kind"] == "continuous"
        assert r["settings"]["display_channel"] == 2
        with pytest.raises(urllib.error.HTTPError):
            _post(srv, "/api/settings", {"display_channel": 9})
        raw = _get(srv, "/api/frame")
        assert len(raw) == 8 + 64 * 128 * 4            # one channel's view
    finally:
        srv.stop()


def test_axis_ticks_follow_zoom(shell):
    """The frequency-ruler endpoint returns landmark ticks inside the
    visible axis, and the tick set moves when Freq Scale (a continuous
    slider) changes — the ruler is computed per request, never cached
    against the pipeline."""
    ticks = json.loads(_get(shell, "/api/axis"))
    assert ticks and all(0.0 <= t["frac"] <= 1.0 for t in ticks)
    labels = [t["label"] for t in ticks]
    assert any("kHz" in l for l in labels)
    fracs = {t["label"]: t["frac"] for t in ticks}
    _post(shell, "/api/settings", {"freq_scale": 3.0})
    try:
        zoomed = {t["label"]: t["frac"]
                  for t in json.loads(_get(shell, "/api/axis"))}
        moved = [l for l in fracs if l in zoomed
                 and abs(zoomed[l] - fracs[l]) > 1e-3]
        assert moved or set(zoomed) != set(fracs)
    finally:
        _post(shell, "/api/settings", {"freq_scale": 1.0})


def test_stream_pushes_frames(shell):
    """/api/stream delivers length-implicit (h, w)-prefixed RGBA frames
    as columns land (the page's push path; polling is the fallback)."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", shell.port, timeout=10)
    conn.request("GET", "/api/stream")
    r = conn.getresponse()
    try:
        frames = 0
        deadline = time.perf_counter() + 8.0
        buf = b""
        while frames < 2 and time.perf_counter() < deadline:
            chunk = r.read1(65536)
            if not chunk:
                time.sleep(0.02)
                continue
            buf += chunk
            while len(buf) >= 8:
                h = int.from_bytes(buf[:4], "big")
                w = int.from_bytes(buf[4:8], "big")
                need = 8 + h * w * 4
                if len(buf) < need:
                    break
                assert (h, w) == (128, 256)
                buf = buf[need:]
                frames += 1
        assert frames >= 2
    finally:
        conn.close()


def test_m4l_minimize_restore_pauses_shell(shell, tmp_path):
    """Ableton writes live_state.json; the shell's stream pauses (the
    page shows the minimized overlay via /api/state)."""
    state_file = tmp_path / "userdir" / "live_state.json"
    assert state_file.exists()                    # auto-created on launch
    state_file.write_text(json.dumps({"state": "minimized"}))
    deadline = time.perf_counter() + 3.0
    paused = False
    while time.perf_counter() < deadline:
        if json.loads(_get(shell, "/api/state"))["paused"]:
            paused = True
            break
        time.sleep(0.05)
    assert paused
    state_file.write_text(json.dumps({"state": "restored"}))
    deadline = time.perf_counter() + 3.0
    while time.perf_counter() < deadline:
        if not json.loads(_get(shell, "/api/state"))["paused"]:
            break
        time.sleep(0.05)
    assert not json.loads(_get(shell, "/api/state"))["paused"]


def test_shell_prewarms_fft_dropdown(tmp_path):
    """The CLI shell pre-compiles the FFT-size dropdown in the background
    (SURVEY §7 hard part 3) so a structural size switch hits the pipeline
    cache instead of stalling the display on a fresh compile."""
    from emspec.pipeline import _cached_pipeline

    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=128, raster_width=256, hop=256)
    srv = ShellServer(s, port=0, source="synthetic",
                      user_dir=tmp_path / "userdir", prewarm_sizes=(512,))
    srv.start()         # stop() blocks unless serve_forever is running
    try:
        assert srv.app._warm_future is not None
        srv.app._warm_future.result(timeout=180)   # warm finished
        before = _cached_pipeline.cache_info().hits
        assert srv.app.set(fft_size=512) == "structural"
        assert _cached_pipeline.cache_info().hits > before
    finally:
        srv.stop()


def test_settings_churn_under_live_drain(shell):
    """Stress the app/shell locking seam: rapid mixed continuous +
    structural settings changes against the live drain worker and the
    synthetic capture producer must never wedge the server or corrupt a
    response.  (Single-change behavior is pinned elsewhere; this hunts
    lock-ordering and stream-swap races.)"""
    import random

    rng = random.Random(0)
    changes = []
    for _ in range(40):
        kind = rng.randrange(4)
        if kind == 0:
            changes.append({"gain": rng.uniform(0.5, 9.0)})
        elif kind == 1:
            changes.append({"fft_size": rng.choice([512, 1024, 2048])})
        elif kind == 2:
            changes.append({"mode": rng.choice(["natural", "enhanced"])})
        else:
            changes.append({"smoothing": rng.uniform(0.0, 0.9),
                            "colormap": rng.choice(["inferno", "viridis"])})
    for payload in changes:
        r = _post(shell, "/api/settings", payload)
        assert r["kind"] in ("continuous", "structural", "noop")
        # the server stays fully responsive mid-churn
        st = json.loads(_get(shell, "/api/state"))
        assert "paused" in st
    # after the storm: a coherent frame at the final geometry
    raw = _get(shell, "/api/frame")
    s = json.loads(_get(shell, "/api/settings"))
    assert len(raw) == 128 * 256 * 4 + 8  # rows*width*4 + header
    assert s["fft_size"] in (512, 1024, 2048)


def test_on_top_surfaced_as_native_only(shell):
    """Honest affordance (round-3 VERDICT #7): the web shell advertises
    that it cannot honor On-Top, and the page disables the button with a
    native-window tooltip instead of silently accepting the click."""
    meta = json.loads(_get(shell, "/api/meta"))
    assert meta["on_top_supported"] is False
    page = _get(shell, "/").decode()
    assert "on_top_supported" in page
    assert "disabled" in page and "--native" in page


def test_record_endpoint_returns_live_apng(shell, tmp_path):
    """/api/record captures the scrolling display to a valid APNG — the
    screen-recording analog of the reference window.  Frames are live
    snapshots: with the synthetic source feeding, a 0.6 s recording at
    5 fps returns 3 canvas-sized frames and the display moved."""
    from emspec.render.apng import read_apng

    raw = _get(shell, "/api/record?seconds=0.6&fps=5")
    p = tmp_path / "rec.png"
    p.write_bytes(raw)
    frames, fps = read_apng(p)
    assert fps == 5
    assert frames.shape == (3, 128, 256, 4)
    # the live display scrolled during the capture window
    assert not np.array_equal(frames[0], frames[-1])


def test_record_survives_structural_change_midway(shell, tmp_path):
    """A structural settings change (raster size) landing mid-recording
    must yield a truncated-but-valid APNG of the pre-change frames, not
    a ValueError out of the handler (ADVICE round 4)."""
    import threading

    from emspec.render.apng import read_apng

    out = {}

    def rec():
        out["raw"] = _get(shell, "/api/record?seconds=1.6&fps=5")

    th = threading.Thread(target=rec)
    th.start()
    time.sleep(0.7)                  # a few frames in
    _post(shell, "/api/settings", {"raster_height": 64})
    th.join(timeout=15)
    assert not th.is_alive()
    p = tmp_path / "trunc.png"
    p.write_bytes(out["raw"])
    frames, fps = read_apng(p)       # valid APNG, pre-change canvas
    assert fps == 5
    assert frames.shape[1:] == (128, 256, 4)
    assert 1 <= frames.shape[0] < 8


def test_record_endpoint_rejects_bad_params(shell):
    import urllib.error

    for bad in ("seconds=0", "fps=1000", "seconds=oops"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(shell, f"/api/record?{bad}")
        assert ei.value.code == 400


def test_client_hangup_is_silent_and_nonfatal(shell, capsys):
    """A client that disconnects mid-response (tab closed, request
    timeout — observed as BrokenPipeError stacks during the natural-mode
    soak's startup compile window) is normal traffic: the server must
    not print a traceback, and must keep serving.  Any other handler
    exception still gets the default stderr report."""
    import socket

    # real hangup: send a request, close before reading the response
    sk = socket.create_connection(("127.0.0.1", shell.port), timeout=5)
    sk.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
    sk.close()
    time.sleep(0.3)                        # let the handler thread hit the pipe
    assert json.loads(_get(shell, "/api/meta"))["version"]  # still serving
    assert "Traceback" not in capsys.readouterr().err

    # the suppression is scoped to connection errors only
    try:
        raise BrokenPipeError(32, "broken pipe")
    except BrokenPipeError:
        shell.httpd.handle_error(None, ("127.0.0.1", 1))
    assert capsys.readouterr().err == ""
    try:
        raise ValueError("handler bug")
    except ValueError:
        shell.httpd.handle_error(None, ("127.0.0.1", 1))
    assert "ValueError" in capsys.readouterr().err


def test_hostile_settings_barrage_over_http(shell):
    """Hostile /api/settings payloads (types, NaN/inf, zero dims,
    bogus keys) must each answer 400 with a JSON error — never a dead
    socket — and leave the app alive, painting, and settable."""
    import urllib.error

    hostile = [{"gain": "x"}, {"gain": None}, {"smoothing": float("nan")},
               {"db_range": 1e308}, {"freq_scale": -5.0},
               {"raster_height": 0}, {"bogus_key": 1}, {"gain": [1, 2]},
               {"scroll_speed": 0}, {"sample_rate": 0}]
    for h in hostile:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(shell, "/api/settings", h)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())
    f1 = _get(shell, "/api/frame")
    time.sleep(0.5)
    assert _get(shell, "/api/frame") != f1          # still painting
    assert _post(shell, "/api/settings",
                 {"gain": 5.0})["kind"] == "continuous"
