"""Leak localization for the 10-min soak finding (round 4).

The full soak measured RSS +787 MB/min under churn.  Raw samples show
the slope UNCHANGED during a 40 s column stall, so the leak may sit
off the column path.  This probe runs short CPU soaks with components
toggled:

  python bench_probes/soak_diag.py full     60   # shell+feeder+churn
  python bench_probes/soak_diag.py nochurn  60   # shell+feeder only
  python bench_probes/soak_diag.py churnonly 60  # shell idle + churn
  python bench_probes/soak_diag.py idle     60   # shell only, no feed

Writes one JSON line to stdout.  CPU backend (leak is host RSS).
"""
import json
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    variant = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0

    from emspec.bench.soak import _Churn
    from emspec.config import Settings
    from emspec.shell import ShellServer
    import tempfile

    s = Settings(mode="enhanced", multires=True)
    with tempfile.TemporaryDirectory(prefix="emspec_diag_") as ud:
        src = "synthetic" if variant != "idle" else "synthetic"
        srv = ShellServer(s, port=0, source=src, user_dir=ud)
        if variant == "idle":
            # start HTTP + drain but no feeder: no audio ever arrives
            srv._worker = None
            import threading
            threading.Thread(target=srv.httpd.serve_forever,
                             daemon=True).start()
        else:
            srv.start()
            t_warm = time.perf_counter()
            while (srv.columns_emitted == 0
                   and time.perf_counter() - t_warm < 60.0):
                time.sleep(0.1)

        churn = None
        if variant in ("full", "churnonly"):
            churn = _Churn(srv.port)
            churn.start()

        samples = []
        t0 = time.perf_counter()
        while True:
            now = time.perf_counter() - t0
            samples.append((round(now, 1), round(rss_mb(), 1),
                            srv.columns_emitted))
            if now >= seconds:
                break
            time.sleep(5.0)

        if churn is not None:
            churn.stop_ev.set()
            churn.join(timeout=5)
        if variant == "idle":
            srv.httpd.shutdown()
            srv.httpd.server_close()
        else:
            srv.stop()

    import numpy as np
    ts = np.array([p[0] for p in samples])
    rs = np.array([p[1] for p in samples])
    m = ts >= min(15.0, ts[-1] / 4)
    slope = float(np.polyfit(ts[m], rs[m], 1)[0]) * 60.0 if m.sum() >= 2 else 0.0
    print(json.dumps({
        "variant": variant,
        "seconds": samples[-1][0],
        "rss_start": samples[0][1],
        "rss_end": samples[-1][1],
        "slope_mb_per_min": round(slope, 1),
        "columns": samples[-1][2],
        "churn": churn.counts if churn else None,
        "raw": samples,
    }))


if __name__ == "__main__":
    main()
