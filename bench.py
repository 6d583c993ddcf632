"""Driver benchmark: prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): reassigned-spectrogram frames/sec/chip at
8192-pt FFT.  The reference publishes no numbers (distribution-only repo),
so ``vs_baseline`` is the ratio to the 60 fps sustained-display north-star
target.  Run the full report with ``python -m emspec bench``.
"""

import json
import sys


def main() -> int:
    from emspec.bench.harness import primary_metric
    from emspec.dsp.pallas.validate import validate_kernels
    quick = "--quick" in sys.argv
    # every bench run re-validates the Pallas kernels on the live backend
    # (real Mosaic compile + parity on TPU) before any number is reported
    validate_kernels(quick=True)
    print(json.dumps(primary_metric(quick=quick)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
