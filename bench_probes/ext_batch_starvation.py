"""Are the §5.7 ext configs (65536/131072) batch-starved in the bench?

The stress deposits kernel measures ~70% of bf16 peak at b=688 frames
per call; the ext configs' 4 s signals give t_count=8 - a single
t_tile=8 grid step, no pipeline overlap, table loads amortized over 8
frames.  A/B the same configs at 4 s vs 16 s vs 32 s of signal to see
whether the cited device cols/s underestimates steady-state capability.

Run from /root/repo: python -m bench_probes.ext_batch_starvation
"""
import json
from emspec.bench.harness import _throughput
from emspec.config import Settings

for n in (65536, 131072):
    s = Settings(mode="enhanced", multires=False, fft_size=n,
                 sample_rate=96_000)
    for secs in (4.0, 16.0, 32.0):
        r = _throughput(s, secs, 8)
        print(f"n={n} secs={secs}: t={r['t_count']} "
              f"device {r['device_columns_per_sec']:.0f} cols/s "
              f"({r['device_ms_per_call']:.3f} ms/call, "
              f"{r['device_ms_per_call']/r['t_count']*1e3:.1f} us/col)")
