"""131072-pt FFT feasibility probe (SURVEY §5.7 scaling, one more octave).

65536 rode the existing enhanced fast path at zero new kernel code
(BENCH.md item 27).  The next octave needs the (256, 512) four-step
factorization: step-3 tables grow to 512x512 and a t_tile=8 frame block
is 4 MB/array in VMEM, so this probe measures (a) XLA-path parity vs
numpy float64, (b) whether Mosaic still compiles the fused kernels at
t_tile 8/4/2 and their parity, (c) end-to-end enhanced throughput at
96 kHz via the production _throughput harness.

MEASURED (v5e, 2026-08-17) and ADOPTED (BENCH.md item 32): XLA path
rel err 1.3e-7; fft4_steps123 compiles at every t_tile incl. 8, rel
err 5.5e-6; fft4_deposits compiles + runs at tt=8; deposits parity vs
the unfused chain: energy sum 1.6e-3, max-filter max dev 2.3e-3 of
peak on 0.8% of bins (0.01 dB — the depth-scaled validate.py bound
covers it); end-to-end 44.7k cols/s device (0.179 ms/call, 4,824x
real time at 96 kHz).

Run from /root/repo (never via PYTHONPATH - it breaks the axon backend
registration, CLAUDE.md gotchas): python -m bench_probes.fft131072_probe
"""

import numpy as np
import jax
import jax.numpy as jnp

import emspec.config as config
from emspec.dsp import fourstep

N = 131072
fourstep._FACTORS.setdefault(N, (256, 512))
fourstep._tables.cache_clear()
if N not in config.FFT_SIZES:
    config.FFT_SIZES = config.FFT_SIZES + (N,)

print("backend:", jax.default_backend())

# ---------------------------------------------------------------- (a) XLA path
rng = np.random.default_rng(0)
x = rng.standard_normal((2, N)).astype(np.float32)
want = np.fft.fft(x.astype(np.float64))
Xr, Xi = fourstep.fft_fourstep(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)),
                               use_pallas=False)
got = np.asarray(Xr) + 1j * np.asarray(Xi)
scale = np.abs(want).max()
err = np.abs(got - want).max() / scale
print(f"xla fourstep rel err: {err:.2e}")
assert err < 5e-5, "XLA four-step parity fails at (256,512)"

# ------------------------------------------------------- (b) fused Mosaic path
from emspec.dsp.pallas import fft4

for tt in (8, 4, 2):
    try:
        zr = jnp.asarray(x).reshape(2, 256, 512)
        zr = jnp.concatenate([zr] * (tt // 2 if tt > 2 else 1), 0)
        b = zr.shape[0]
        Fr, Fi = fft4.fft4_steps123(zr, jnp.zeros_like(zr), t_tile=tt)
        Fr, Fi = np.asarray(Fr), np.asarray(Fi)
        # compare frame 0 against the XLA path's pre-step-4 block
        w = want[0].reshape(512, 256).T       # X[k1 + 256*k2] -> (k1, k2)
        g = Fr[0] + 1j * Fi[0]
        e = np.abs(g - w).max() / scale
        print(f"fft4_steps123 tt={tt} (b={b}): compiled, rel err {e:.2e}")
    except Exception as ex:
        print(f"fft4_steps123 tt={tt}: FAILED - {type(ex).__name__}: "
              f"{str(ex)[:200]}")

# deposits kernel parity at the production tolerance discipline
try:
    from emspec.dsp.pallas.validate import validate_deposits
    validate_deposits(N, b=2)
    print("validate_deposits(131072): PASS (tt=2 via b)")
except Exception as ex:
    print(f"validate_deposits(131072): FAIL - {type(ex).__name__}: "
          f"{str(ex)[:300]}")

# production-batch deposits compile (tt=8 and tt=4)
from emspec.dsp.windows import hann  # noqa: F401  (warm import path)
for tt in (8, 4):
    try:
        frames = jnp.asarray(rng.standard_normal((tt, N)).astype(np.float32))
        outs = fft4.fft4_deposits(frames, np.float32(np.log2(20.0)),
                                  np.float32(0.02), np.float32(1e-12),
                                  n=N, hop=N // 4, sr=96000.0, rows=512,
                                  t_tile=tt)
        _ = np.asarray(outs[-1]).sum()
        print(f"fft4_deposits tt={tt}: compiled + ran")
    except Exception as ex:
        print(f"fft4_deposits tt={tt}: FAILED - {type(ex).__name__}: "
              f"{str(ex)[:200]}")

# ------------------------------------------------- (c) end-to-end throughput
try:
    from emspec.bench.harness import _throughput
    from emspec.config import Settings
    s = Settings(mode="enhanced", multires=False, fft_size=N,
                 sample_rate=96_000)
    r = _throughput(s, 4.0, 8)
    print("end-to-end:", {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items() if k != "roofline"})
except Exception as ex:
    print(f"end-to-end: FAILED - {type(ex).__name__}: {str(ex)[:300]}")
