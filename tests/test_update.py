"""Auto-update check analog (VERDICT round-2 missing #2; reference
README.md:53-55: checks on startup, notifies in the settings window).
The check is offline-safe: every failure mode returns None."""

import json

import pytest

from emspec.utils.update import (UPDATE_MANIFEST_ENV, UpdateChecker,
                                 check_for_update, parse_version)


def test_parse_version():
    assert parse_version("1.2.3") == (1, 2, 3)
    assert parse_version("v0.4.3") == (0, 4, 3)
    assert parse_version("2.0.0-rc1") == (2, 0, 0)
    assert parse_version("1.10") > parse_version("1.9")
    with pytest.raises(ValueError):
        parse_version("not-a-version")


def _manifest(tmp_path, latest, url="https://example.invalid/dl"):
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps({"latest": latest, "url": url}))
    return str(p)


def test_newer_version_notifies(tmp_path):
    m = _manifest(tmp_path, "99.0.0")
    notice = check_for_update(m, current="0.2.0")
    assert notice == {"latest": "99.0.0", "current": "0.2.0",
                      "url": "https://example.invalid/dl"}


def test_same_or_older_is_silent(tmp_path):
    assert check_for_update(_manifest(tmp_path, "0.2.0"),
                            current="0.2.0") is None
    assert check_for_update(_manifest(tmp_path, "0.1.9"),
                            current="0.2.0") is None


def test_offline_safe_failures(tmp_path, monkeypatch):
    # no manifest configured at all
    monkeypatch.delenv(UPDATE_MANIFEST_ENV, raising=False)
    assert check_for_update() is None
    # missing file
    assert check_for_update(str(tmp_path / "nope.json")) is None
    # unreachable URL (zero-egress environment: this must not raise)
    assert check_for_update("http://127.0.0.1:9/manifest.json",
                            timeout=0.2) is None
    # corrupt JSON
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert check_for_update(str(bad)) is None
    # junk version string
    junk = tmp_path / "junk.json"
    junk.write_text(json.dumps({"latest": "tomorrow"}))
    assert check_for_update(str(junk)) is None


def test_env_var_source(tmp_path, monkeypatch):
    monkeypatch.setenv(UPDATE_MANIFEST_ENV, _manifest(tmp_path, "99.0.0"))
    notice = check_for_update(current="0.1.0")
    assert notice and notice["latest"] == "99.0.0"


def test_background_checker(tmp_path):
    chk = UpdateChecker(_manifest(tmp_path, "99.0.0"), current="0.1.0")
    assert chk.wait(5.0)["latest"] == "99.0.0"
    chk2 = UpdateChecker(None, current="0.1.0")   # nothing configured
    assert chk2.wait(5.0) is None


def test_shell_surfaces_update_notice(tmp_path, monkeypatch):
    """The settings-window notice (reference README.md:55): /api/meta,
    /api/state, and the /api/settings response all carry the notice."""
    import urllib.request

    from emspec.config import Settings
    from emspec.shell import ShellServer

    monkeypatch.setenv(UPDATE_MANIFEST_ENV, _manifest(tmp_path, "99.0.0"))
    s = Settings(mode="natural", multires=False, fft_size=1024,
                 raster_height=128, raster_width=256, hop=256)
    srv = ShellServer(s, port=0, source="synthetic",
                      user_dir=tmp_path / "userdir")
    srv.start()
    try:
        srv.update_check.wait(5.0)
        base = f"http://127.0.0.1:{srv.port}"
        meta = json.loads(urllib.request.urlopen(
            base + "/api/meta", timeout=10).read())
        assert meta["update"]["latest"] == "99.0.0"
        state = json.loads(urllib.request.urlopen(
            base + "/api/state", timeout=10).read())
        assert state["update"]["latest"] == "99.0.0"
        req = urllib.request.Request(base + "/api/settings",
                                     data=b'{"gain": 5.5}', method="POST")
        r = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert r["update"]["latest"] == "99.0.0"
        page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        assert "update available" in page          # header notice wiring
    finally:
        srv.stop()
