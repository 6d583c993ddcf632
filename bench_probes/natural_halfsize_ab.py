"""A/B probe (VERDICT round-2 #10): natural-mode rFFT via the half-size
real trick (N-pt real FFT as an N/2-pt complex FFT + untwist) vs XLA's
batched rfft — the engine natural mode actually uses.

Natural mode needs |X_h|^2 only; the candidate replaces one N-rfft per
frame with one N/2 complex FFT (XLA or einsum-fourstep) plus the
Hermitian untwist.  Decision rule (BENCH.md opt-log 9 discipline):
adopt only if >=1.3x end-to-end on the natural config, else record the
one-line negative result.

Run from /root/repo (never via PYTHONPATH — it breaks the axon backend
registration, CLAUDE.md gotchas): python bench_probes/natural_halfsize_ab.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms, probe_chain

N = 2048
B = 368          # ~4 s at 48 kHz, hop 512 (the bench natural config)


def rfft_xla(wf):
    return jnp.abs(jnp.fft.rfft(wf, axis=-1)) ** 2


def _untwist_power(Z, n):
    """|X|^2 of the length-n real FFT from the n/2 complex FFT of
    z = x[::2] + i*x[1::2] (standard split-radix untwist)."""
    nh = n // 2
    k = jnp.arange(nh + 1)
    Zf = jnp.concatenate([Z, Z[..., :1]], axis=-1)          # Z(n/2) = Z(0)
    Zr = jnp.flip(Z, axis=-1)                               # Z(n/2 - k), k=1..
    Zrev = jnp.concatenate([Z[..., :1], Zr], axis=-1)
    A = 0.5 * (Zf + jnp.conj(Zrev))
    Bc = -0.5j * (Zf - jnp.conj(Zrev))
    w = jnp.exp(-2j * jnp.pi * k / n).astype(Z.dtype)
    X = A + w * Bc
    return jnp.abs(X) ** 2


def rfft_halfsize_xla(wf):
    z = jax.lax.complex(wf[..., ::2], wf[..., 1::2])
    return _untwist_power(jnp.fft.fft(z, axis=-1), N)


def rfft_halfsize_fourstep(wf):
    from emspec.dsp.fourstep import fft_fourstep
    zr = wf[..., ::2]
    zi = wf[..., 1::2]
    Xr, Xi = fft_fourstep(zr, zi, use_pallas=False)
    return _untwist_power(jax.lax.complex(Xr, Xi), N)


def time_of(fn, wf):
    k = 16
    step = probe_chain(fn, wf)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda p, _: (step(p), 0.0), c, None, length=k)[0])
    return chain_marginal_ms(f, lambda: jnp.float32(0.0), k, reps=5)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(11)
    wf = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    want = np.asarray(jax.jit(rfft_xla)(wf))
    for name, fn in (("xla_rfft", rfft_xla),
                     ("halfsize_xla_fft", rfft_halfsize_xla),
                     ("halfsize_fourstep", rfft_halfsize_fourstep)):
        got = np.asarray(jax.jit(fn)(wf))
        rel = np.abs(got - want).max() / want.max()
        t = time_of(fn, wf)
        print(f"{name}: {t:.3f} ms/call  parity {rel:.2e}")


if __name__ == "__main__":
    main()
