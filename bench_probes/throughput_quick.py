import json
from emspec.bench.harness import _throughput
from emspec.config import Settings
for name, s in [("multires", Settings(mode="enhanced", multires=True)),
                ("primary_8192", Settings(mode="enhanced", multires=False, fft_size=8192)),
                ("stress", Settings(mode="enhanced", multires=False, fft_size=32768, sample_rate=96_000, channels=16))]:
    r = _throughput(s, 4.0, 8)
    print(name, json.dumps({k: round(v,3) if isinstance(v,float) else v
                            for k,v in r.items() if k != "roofline"}))
