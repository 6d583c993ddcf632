"""Window-shell analog: a zero-dependency local web shell over EmSpecApp
(VERDICT round-1 #4 — the last large reference-surface gap).

The reference is a frameless desktop window with a settings panel
(reference: README.md:13,35-39; assets/settings.png); its shell duties
are: blit the raster, host the live settings surface, show the hover
tooltip, honor On-Top, and mirror Ableton's Info View via the
``live_state.json`` watcher (docs/MAX-FOR-LIVE.md).  This shell serves
exactly those duties over HTTP from the stdlib — ``python -m emspec gui``
opens a browser page; headless environments keep the terminal view
(``emspec live``), and every endpoint is testable without a browser.

Threading model: the capture/WAV feeder thread is the ring's single
producer; one worker thread drains analysis hops and paints the
waterfall; HTTP handler threads only read snapshots or apply settings —
every EmSpecApp mutation happens under one lock, so the
continuous-vs-structural contract (§3.3) is exercised exactly as the
app controller defines it (the /api/settings response reports which kind
each change was — the page displays "no recompile" live).
"""

from __future__ import annotations

import json
import struct
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from emspec.app import EmSpecApp
from emspec.config import COLORMAPS, FFT_SIZES, Settings


class _QuietServer(ThreadingHTTPServer):
    """A client that hangs up mid-response (tab closed, request timeout)
    is normal desktop-app traffic, not a server fault: swallow the
    resulting connection errors instead of spewing a traceback per
    disconnect to stderr (observed: churn-soak clients timing out during
    the startup compile window left BrokenPipeError stacks).  Every
    other handler exception still gets the default report."""

    def handle_error(self, request, client_address):
        # sys.exc_info, not sys.exception(): the latter is 3.12-only and
        # pyproject declares >= 3.10
        exc = sys.exc_info()[1]
        if isinstance(exc, (ConnectionError, TimeoutError)):
            return
        super().handle_error(request, client_address)


class ShellServer:
    """Owns the app, the feeder, the drain worker, and the HTTP server."""

    def __init__(self, settings: Settings | None = None, port: int = 0,
                 source: str = "auto", wav_path: str | None = None,
                 user_dir: str = ".emspec",
                 prewarm_sizes: tuple | None = None):
        # prewarm_sizes: pre-compile the FFT-size dropdown in a background
        # worker so a structural settings change never stalls the live
        # display (SURVEY.md §7 hard part 3); the CLI passes the full
        # dropdown, tests keep it off
        self.app = EmSpecApp(settings, user_dir=user_dir,
                             prewarm_sizes=prewarm_sizes)
        self.lock = threading.RLock()
        self._stop = threading.Event()
        # frame push: the drain worker bumps the sequence whenever new
        # columns landed; /api/stream connections wait on the condition
        self._frame_seq = 0
        self._frame_cv = threading.Condition()
        self.columns_emitted = 0     # lifetime drain total (soak metric)
        from emspec.shell.feed import AudioFeeder
        self.feeder = AudioFeeder(self.app, source=source, wav_path=wav_path,
                                  lock=self.lock)
        self._worker = None
        # async update check on startup, notice surfaced in the settings
        # window header (reference README.md:53-55; offline-safe — no
        # manifest configured means .notice stays None)
        from emspec.utils.update import UpdateChecker
        self.update_check = UpdateChecker()
        self.httpd = _QuietServer(("127.0.0.1", port),
                                  self._make_handler())
        self.port = self.httpd.server_address[1]

    # --------------------------------------------------------------- feeding
    def _drain_loop(self) -> None:
        while not self._stop.is_set():
            with self.lock:
                ch = self.app.settings.channels   # may change structurally
                empty = (np.zeros((ch, 0), np.float32) if ch > 1
                         else np.zeros(0, np.float32))
                emitted = self.app.push_audio(empty)
            if emitted:
                self.columns_emitted += emitted
                with self._frame_cv:
                    self._frame_seq += 1
                    self._frame_cv.notify_all()
            time.sleep(1.0 / 60.0)

    # --------------------------------------------------------------- control
    def start(self) -> None:
        self.feeder.start()
        self._worker = threading.Thread(target=self._drain_loop, daemon=True)
        self._worker.start()
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def stop(self) -> None:
        self._stop.set()
        self.app.close()      # abandon queued prewarm compiles
        self.feeder.stop()
        if self._worker is not None:
            # join the drain worker: a daemon thread mid-JAX-dispatch at
            # interpreter teardown segfaults in XLA's C++ destructors
            # (reproduced: `emspec gui --duration 1` exited rc=139)
            self._worker.join(timeout=5.0)
            self._worker = None
        self.httpd.shutdown()
        self.httpd.server_close()

    def serve_forever(self, duration: float = 0.0) -> None:
        """Blocking run; duration 0 = until KeyboardInterrupt."""
        self.start()
        try:
            if duration > 0:
                time.sleep(duration)
            else:
                while True:
                    time.sleep(1.0)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    # ------------------------------------------------------------------ HTTP
    def _make_handler(self):
        shell = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):       # quiet
                pass

            def _send(self, body: bytes, ctype: str, code: int = 200):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, obj, code: int = 200):
                self._send(json.dumps(obj).encode(), "application/json", code)

            def do_GET(self):
                url = urlparse(self.path)
                q = parse_qs(url.query)
                app = shell.app
                if url.path == "/":
                    from emspec.shell.page import PAGE
                    self._send(PAGE.encode(), "text/html; charset=utf-8")
                elif url.path == "/api/meta":
                    import jax
                    from emspec import __version__
                    self._json({"version": __version__,
                                "backend": jax.default_backend(),
                                "fft_sizes": list(FFT_SIZES),
                                "colormaps": list(COLORMAPS),
                                # a browser tab can't be topmost: only the
                                # native tkinter window honors On-Top
                                # (README.md:13); surfaced so the page
                                # disables the button instead of silently
                                # accepting the click (round-3 VERDICT)
                                "on_top_supported": False,
                                "update": shell.update_check.notice})
                elif url.path == "/api/settings":
                    self._json(app.settings.to_dict())
                elif url.path == "/api/frame":
                    with shell.lock:
                        img = app.image()            # (rows, width, 4)
                    body = (struct.pack(">II", img.shape[0], img.shape[1])
                            + np.ascontiguousarray(img).tobytes())
                    self._send(body, "application/octet-stream")
                elif url.path == "/api/state":
                    self._json({"paused": app.stream._paused,
                                "on_top": app.settings.on_top,
                                "dropped_frames": app.stream.dropped_frames,
                                "update": shell.update_check.notice})
                elif url.path == "/api/axis":
                    with shell.lock:
                        self._json(app.axis_ticks())
                elif url.path == "/api/stream":
                    # chunked binary frame push (stdlib analog of a
                    # WebSocket): length-implicit (h, w)-prefixed RGBA
                    # frames until the client disconnects.  Cuts the
                    # display path from 66 ms polling to push-on-column
                    # (throttled to ~30 fps).
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("Cache-Control", "no-store")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    last = -1
                    while not shell._stop.is_set():
                        with shell._frame_cv:
                            if shell._frame_seq == last:
                                shell._frame_cv.wait(timeout=0.25)
                            seq = shell._frame_seq
                        if seq == last:
                            continue        # idle wakeup, nothing new
                        last = seq
                        with shell.lock:
                            img = app.image()
                        body = (struct.pack(">II", img.shape[0],
                                            img.shape[1])
                                + np.ascontiguousarray(img).tobytes())
                        try:
                            self.wfile.write(body)
                            self.wfile.flush()
                        except (BrokenPipeError, ConnectionResetError,
                                ConnectionAbortedError):
                            break
                        time.sleep(1.0 / 30.0)
                elif url.path == "/api/record":
                    # live capture of the scrolling display to an APNG —
                    # the analog of screen-recording the reference window
                    # (README.md:35-39).  Frames are snapshotted at fps
                    # on this handler thread and compressed one at a
                    # time (emspec/render/apng.py apng_bytes), so a
                    # 30 s recording never holds the raw frame stack.
                    from emspec.render.apng import apng_bytes
                    try:
                        seconds = float(q.get("seconds", ["2"])[0])
                        fps = float(q.get("fps", ["15"])[0])
                    except ValueError:
                        self._json({"error": "seconds/fps must be numbers"},
                                   400)
                        return
                    if not (0 < seconds <= 60) or not (0 < fps <= 60):
                        self._json({"error": "need 0 < seconds <= 60 and "
                                             "0 < fps <= 60"}, 400)
                        return
                    n = max(1, round(seconds * fps))
                    t0 = time.monotonic()

                    def snapshots():
                        first_shape = None
                        for k in range(1, n + 1):
                            dt = t0 + k / fps - time.monotonic()
                            if dt > 0:
                                time.sleep(dt)
                            if shell._stop.is_set() and k > 1:
                                return       # truncated but valid APNG
                            with shell.lock:
                                img = app.image()
                            if first_shape is None:
                                first_shape = img.shape
                            elif img.shape != first_shape:
                                # a structural settings change landed
                                # mid-recording (channels/raster size):
                                # stop at the last matching frame — a
                                # truncated-but-valid APNG, same contract
                                # as the shutdown path above (ADVICE r4)
                                return
                            yield img

                    self._send(apng_bytes(snapshots(), fps=fps),
                               "image/apng")
                elif url.path == "/api/hover":
                    try:
                        frac = float(q.get("frac", ["0"])[0])
                    except ValueError:
                        self._json({"error": "frac must be a number"}, 400)
                        return
                    if not np.isfinite(frac):
                        frac = 0.0
                    rows = app.settings.raster_height
                    row = int(np.clip(round(frac * (rows - 1)), 0, rows - 1))
                    with shell.lock:
                        text = app.hover(row)
                    self._send(text.encode(), "text/plain; charset=utf-8")
                elif url.path == "/api/presets":
                    self._json(app.presets.names())
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                url = urlparse(self.path)
                q = parse_qs(url.query)
                app = shell.app
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b"{}"
                if url.path == "/api/settings":
                    try:
                        changes = json.loads(body)
                        with shell.lock:
                            kind = app.set(**changes)
                    except (ValueError, TypeError) as e:
                        self._json({"error": str(e)}, 400)
                        return
                    except Exception as e:          # noqa: BLE001
                        # a value the Settings validation didn't
                        # anticipate: app.set is exception-safe (state
                        # unchanged), so answer with JSON instead of a
                        # dead socket
                        self._json({"error": f"{type(e).__name__}: {e}"},
                                   500)
                        return
                    self._json({"kind": kind,
                                "settings": app.settings.to_dict(),
                                "update": shell.update_check.notice})
                elif url.path.startswith("/api/preset/"):
                    op = url.path.rsplit("/", 1)[1]
                    name = q.get("name", ["Default"])[0]
                    try:
                        with shell.lock:
                            if op == "save":
                                app.save_preset(name)
                                kind = "saved"
                            elif op == "load":
                                kind = app.load_preset(name)
                            elif op == "delete":
                                app.delete_preset(name)
                                kind = "deleted"
                            else:
                                self._json({"error": "unknown op"}, 404)
                                return
                    except (KeyError, ValueError) as e:
                        self._json({"error": str(e)}, 400)
                        return
                    self._json({"kind": kind,
                                "settings": app.settings.to_dict()})
                else:
                    self._json({"error": "not found"}, 404)

        return Handler
