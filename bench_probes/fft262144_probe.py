"""262144-pt FFT feasibility probe (SURVEY §5.7 scaling, third octave
past the reference's 32768 dropdown max).

131072 landed with the (256, 512) factorization at zero new kernel code
(BENCH.md item 32).  The next octave is (512, 512): step-1/3 DFT tables
grow to 512×512 (1 MB f32 each, 6 tables) and a t_tile=8 frame block is
8 MB/array in VMEM, so the open questions are again (a) XLA-path parity
vs numpy float64, (b) whether Mosaic still compiles the fused kernels
and at which t_tile, (c) end-to-end enhanced throughput at 96 kHz via
the production _throughput harness.

MEASURED (v5e, 2026-08-18) and ADOPTED (BENCH.md item 40): XLA path
rel err 1.4e-7; fft4_steps123 compiles at every t_tile incl. 8, rel
err 5.1e-6; fft4_deposits compiles + runs at tt=8 and tt=4; deposits
parity vs the unfused chain at the depth-scaled split-bf16 bound —
energy sum inside 4e-3, max-filter dev 4.2e-3 of peak on 0.4% of bins
(0.018 dB; validate.py's 262144 tier is 6e-3); end-to-end 16.7k cols/s
device (0.478 ms/call, ~11,400x real time at 96 kHz; relay marginal
0.671 ms at t=8).

Run from /root/repo (never via PYTHONPATH - it breaks the axon backend
registration, CLAUDE.md gotchas): python -m bench_probes.fft262144_probe
"""

import numpy as np
import jax
import jax.numpy as jnp

import emspec.config as config
from emspec.dsp import fourstep

N = 262144
fourstep._FACTORS.setdefault(N, (512, 512))
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
assert err < 1e-4, "XLA four-step parity fails at (512,512)"

# ------------------------------------------------------- (b) fused Mosaic path
from emspec.dsp.pallas import fft4

for tt in (8, 4, 2):
    try:
        zr = jnp.asarray(x).reshape(2, 512, 512)
        zr = jnp.concatenate([zr] * (tt // 2 if tt > 2 else 1), 0)
        b = zr.shape[0]
        Fr, Fi = fft4.fft4_steps123(zr, jnp.zeros_like(zr), t_tile=tt)
        Fr, Fi = np.asarray(Fr), np.asarray(Fi)
        # compare frame 0 against the XLA path's pre-step-4 block
        w = want[0].reshape(512, 512).T       # X[k1 + 512*k2] -> (k1, k2)
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
    print("validate_deposits(262144): PASS (tt=2 via b)")
except Exception as ex:
    print(f"validate_deposits(262144): FAIL - {type(ex).__name__}: "
          f"{str(ex)[:300]}")

# production-batch deposits compile (tt=8 and tt=4)
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
    r = _throughput(s, 8.0, 8)     # 8 s: 262144-pt window needs >2.7 s signal
    print("end-to-end:", {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items() if k != "roofline"})
except Exception as ex:
    print(f"end-to-end: FAILED - {type(ex).__name__}: {str(ex)[:300]}")
