"""Bisect the per-column RSS leak on the relay backend (BENCH item 45).

Layers: stream = raw Stream.push loop; +wf = add waterfall add_column;
app = EmSpecApp.push_audio.  Run from /root/repo:

  python bench_probes/leak_bisect.py stream 2000 > /tmp/bisect_stream.json 2>&1
"""
import gc
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def main():
    layer = sys.argv[1]
    n_cols = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from emspec.config import Settings
    from emspec.stream import Stream

    s = Settings(mode="enhanced", multires=True)
    hop = None
    rng = np.random.default_rng(0)

    if layer == "app":
        from emspec.app import EmSpecApp
        import tempfile
        with tempfile.TemporaryDirectory() as ud:
            app = EmSpecApp(s, user_dir=ud)
            hop = app.stream.pipe.hop

            def push(x):
                return app.push_audio(x)
            run(push, hop, s, n_cols, rng, layer)
        return

    stream = Stream(s)
    hop = stream.pipe.hop
    wf = None
    if layer == "+wf":
        from emspec.render.waterfall import Waterfall
        wf = Waterfall(stream.pipe.rows, width=1024,
                       speed=s.scroll_speed, colormap=s.colormap)

    def push(x):
        cols = stream.push(x)
        if wf is not None:
            for c in cols:
                wf.add_column(c.rgba, c.vis)
        return len(cols)

    run(push, hop, s, n_cols, rng, layer)


def run(push, hop, s, n_cols, rng, layer):
    block = hop * 4

    def feed(cols_target):
        done = 0
        while done < cols_target:
            done += push(rng.standard_normal(block).astype(np.float32) * 0.1)

    feed(200)                       # warmup: compiles + first allocations
    gc.collect()
    r0 = rss_kb()
    feed(n_cols)
    gc.collect()
    r1 = rss_kb()
    print(json.dumps({"layer": layer, "cols": n_cols,
                      "kb_per_col": round((r1 - r0) / n_cols, 2),
                      "total_mb": round((r1 - r0) / 1024, 1)}), flush=True)


if __name__ == "__main__":
    main()
