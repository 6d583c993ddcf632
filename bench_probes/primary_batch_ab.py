"""Primary-metric batch-size A/B: the relay adds ~0.3 ms of
per-call dispatch residual, so at t_count=90 (4 s signal) the relay
marginal reads ~3x under chip capability.  Throughput benchmarks use
saturating batch; measure cols/s at 4/16/32/64 s signals to pick the
batch where the driver-facing `value` reflects the chip, not the
tunnel.  Run from /root/repo: python -m bench_probes.primary_batch_ab
"""
from emspec.bench.harness import _throughput
from emspec.config import Settings

s = Settings(mode="enhanced", multires=False, fft_size=8192)
for secs in (4.0, 16.0, 32.0, 64.0):
    r = _throughput(s, secs, 8)
    print(f"secs={secs}: t={r['t_count']} relay {r['columns_per_sec']:.0f} "
          f"device {r['device_columns_per_sec']:.0f} cols/s "
          f"(marginal {r['ms_per_call_marginal']:.3f} ms, device "
          f"{r['device_ms_per_call']:.3f} ms)")
