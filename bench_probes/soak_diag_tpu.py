"""TPU-backend twin of soak_diag (the CPU run measured slope 0.0 —
the 787 MB/min leak is relay-backend-specific).  Run from /root/repo:

  python bench_probes/soak_diag_tpu.py nochurn 120
  python bench_probes/soak_diag_tpu.py full 120
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    variant = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0

    from emspec.bench.soak import _Churn
    from emspec.config import Settings
    from emspec.shell import ShellServer
    import tempfile

    s = Settings(mode="enhanced", multires=True)
    with tempfile.TemporaryDirectory(prefix="emspec_diag_") as ud:
        srv = ShellServer(s, port=0, source="synthetic", user_dir=ud)
        srv.start()
        t_warm = time.perf_counter()
        while (srv.columns_emitted == 0
               and time.perf_counter() - t_warm < 120.0):
            time.sleep(0.1)

        churn = None
        if variant == "full":
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
