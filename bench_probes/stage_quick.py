import json
from emspec.bench.stages import stage_breakdown
from emspec.config import Settings
for name, s in [("primary_8192", Settings(mode="enhanced", multires=False, fft_size=8192)),
                ("multires", Settings(mode="enhanced", multires=True))]:
    r = stage_breakdown(s)
    print(name, json.dumps(r))
