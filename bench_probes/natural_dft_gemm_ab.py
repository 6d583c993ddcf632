"""Natural-mode brute-force DFT-as-GEMM A/B (round-4 candidate, run in
round 3).  Natural mode needs only |X(k)|^2, k = 0..N/2; XLA's batched
rfft costs ~N log N but the MXU turns a (t, N) @ (N, N+2) GEMM into
O(N^2) FLOPs at ~200 TFLOP/s - at N = 2048 the estimates land within
2x of each other, so only a measurement decides.  Three contenders at
the natural display shape (t=368, N=2048), power-spectrum end to end:

  a) jnp.fft.rfft -> |.|^2                  (production path)
  b) full-DFT GEMM, Precision.HIGHEST       (f32-exact class)
  c) full-DFT GEMM, split-bf16 hi/lo tables (3-pass, deposits-kernel
     precision class)

Decision rule (BENCH.md opt-log discipline): adopt only if >=1.3x;
else record the one-line negative result.

Run from /root/repo (never via PYTHONPATH — it breaks the axon backend
registration, CLAUDE.md gotchas): python -m bench_probes.natural_dft_gemm_ab
"""
import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain

N, T = 2048, 368
K = N // 2 + 1
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.standard_normal((T, N)).astype(np.float32))

ang = 2 * np.pi * np.outer(np.arange(N), np.arange(K)) / N
Wc = np.cos(ang).astype(np.float32)
Ws = np.sin(ang).astype(np.float32)
W = jnp.asarray(np.concatenate([Wc, Ws], 1))          # (N, 2K)

def pair(m):
    hi = m.astype(np.float32).astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)

Wh, Wl = pair(np.concatenate([Wc, Ws], 1))

def p_rfft(x):
    X = jnp.fft.rfft(x)
    return jnp.abs(X) ** 2

def p_gemm_hi(x):
    cs = jnp.matmul(x, W, precision=jax.lax.Precision.HIGHEST)
    return cs[:, :K] ** 2 + cs[:, K:] ** 2

def p_gemm_bf16(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    cs = (jnp.matmul(xh, Wh, preferred_element_type=jnp.float32)
          + jnp.matmul(xh, Wl, preferred_element_type=jnp.float32)
          + jnp.matmul(xl, Wh, preferred_element_type=jnp.float32))
    return cs[:, :K] ** 2 + cs[:, K:] ** 2

# parity first
ref = np.abs(np.fft.rfft(np.asarray(frames, np.float64))) ** 2
for name, f in (("rfft", p_rfft), ("gemm_hi", p_gemm_hi),
                ("gemm_bf16", p_gemm_bf16)):
    got = np.asarray(jax.jit(f)(frames))
    err = np.abs(got - ref).max() / ref.max()
    print(f"{name}: rel err vs f64 {err:.2e}")

# timing: scan k power-spectrum calls chained through a probe
def timed(f, k=16):
    step = probe_chain(f, frames)
    g = jax.jit(lambda c: jax.lax.scan(
        lambda p, _: (step(p), 0.0), c, None, length=k)[0])
    return chain_marginal_ms(g, lambda: jnp.float32(0.0), k, reps=5)

print("backend:", jax.default_backend())
for name, f in (("rfft", p_rfft), ("gemm_hi", p_gemm_hi),
                ("gemm_bf16", p_gemm_bf16)):
    ms = timed(f)
    print(f"{name}: {ms:.4f} ms/call ({ms/T*1e3:.3f} us/col)")
