"""Channel-scaling sweep at the primary 8192 config: does per-chip
throughput (total frames/s across channels) hold as the channel batch
grows?  The pipeline folds channels into the GEMM M dimension, so ideal
scaling = flat total frames/s once the MXU saturates; the sweep
quantifies where saturation lands and what a 64-channel deployment
would actually sustain.  Run from /root/repo:
python -m bench_probes.channel_scaling
"""
from emspec.bench.harness import _throughput
from emspec.config import Settings

for ch in (1, 4, 16, 64):
    s = Settings(mode="enhanced", multires=False, fft_size=8192,
                 channels=ch)
    r = _throughput(s, 4.0, 8)
    dev_total = r["device_columns_per_sec"] * ch
    print(f"ch={ch:3d}: device {r['device_columns_per_sec']:9.0f} cols/s "
          f"-> {dev_total/1e3:8.1f}k ch-frames/s total "
          f"({r['device_ms_per_call']:.3f} ms/call, t={r['t_count']})")
