"""The examples/ scripts must stay runnable — they are the library's
front door (README quick-start expanded)."""
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow   # subprocess example runs (300 s ceiling each)

EXAMPLES = sorted((pathlib.Path(__file__).parents[1] / "examples").glob("*.py"))


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script, tmp_path):
    args = [sys.executable, str(script)]
    if script.name == "offline_render.py":
        args.append(str(tmp_path / "out.png"))
    r = subprocess.run(args, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip()


def test_m4l_patch_source_contract():
    """The authored M4L companion-device source (the Ableton side of the
    live_state.json contract) stays a loadable Max patch: valid JSON,
    js dependency present and wired, and the js implements exactly the
    documented states + file name (reference docs/MAX-FOR-LIVE.md)."""
    import json
    from pathlib import Path

    d = Path("emspec/integrations/m4l")
    patch = json.loads((d / "EM-Spec.maxpat").read_text())
    boxes = [b["box"] for b in patch["patcher"]["boxes"]]
    texts = [b.get("text", "") for b in boxes]
    assert any("js emspec_state.js" in t for t in texts)
    assert any(t.startswith("metro") for t in texts)
    # every patchline endpoint refers to an existing box
    ids = {b["id"] for b in boxes}
    for ln in patch["patcher"]["lines"]:
        pl = ln["patchline"]
        assert pl["source"][0] in ids and pl["destination"][0] in ids

    js = (d / "emspec_state.js").read_text()
    assert '"minimized"' in js and '"restored"' in js
    assert "live_state.json" in js
    assert "is_view_visible" in js          # LOM Info View poll
    # the js writes the same JSON shape live_state.py reads
    assert '{"state": "' in js
