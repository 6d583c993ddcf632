"""(128, 64) factorization A/B at 8192 (round-4 VERDICT Weak #2).

BENCH.md item 41 accepted primary-8192's ~50% kernel efficiency because
"the only MXU-shaped factorization is (64, 128)" — but that constraint
is ours (`fft4.supported` requires n1 ≥ 64 AND n2 ≥ 128).  The untested
knob: a (128, 64) factorization runs step 1's contraction at the full
K = n1 = 128 MXU depth (the item-41 analysis blames step 1's K = 64 for
half the efficiency loss) at the cost of 64-wide lanes in the twiddle /
step 3 / epilogue (Mosaic pads 64 → 128 lanes, so those tiles run
half-empty).  Plausibly a wash — this probe measures it either way.

Protocol (BENCH.md methodology: scan-marginal, fetch-forced, median,
same-session interleaved A/B at the item-41 pinned shape):

1. A = production (64, 128): fused deposits standalone + full
   `_batch_vis` at the pinned 16 s / t=372 shape;
2. patch `_FACTORS[8192] = (128, 64)` + widen `fft4.supported`, clear
   the table/jit caches, parity-gate with `validate_deposits(8192)`
   (fused vs the unfused XLA four-step chain at the SAME patched
   factorization), then measure B identically;
3. restore and re-measure A to bound session drift.

Run from /root/repo (TPU backend): python -m bench_probes.fft8192_factor_ab
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from emspec.bench.harness import _signal
from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.config import Settings
from emspec.pipeline import Pipeline
from emspec.post.chain import PostState

SECONDS = 16.0          # the pinned saturating batch (BENCH.md item 37)


def scan_ms(fn, *args, k=8):
    step = probe_chain(fn, *args)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (step(cc), None), c, None, length=k)[0])
    return chain_marginal_ms(f, lambda: jnp.float32(0.0), k)


def set_factor(f):
    import emspec.dsp.fourstep as fs
    fs._FACTORS[8192] = f
    fs._tables.cache_clear()
    jax.clear_caches()


def measure(tag):
    s = Settings(mode="enhanced", multires=False, fft_size=8192)
    pipe = Pipeline(s)
    assert pipe._use_fused_deposits(8192), f"{tag}: fused path not active"
    x = _signal(SECONDS, s.sample_rate, 1)
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    xd = jax.device_put(x)
    st = PostState.init((pipe.rows,))

    def deposits(x):
        return pipe._deposit_ids_rel(pipe._bank_inputs(x, t_count), p)

    dep_ms = scan_ms(deposits, xd)
    full_ms = scan_ms(lambda x: pipe._batch_vis(x, p, st, t_count)[:2], xd)
    out = {"tag": tag, "t_count": t_count,
           "deposits_ms": round(dep_ms, 4), "full_ms": round(full_ms, 4),
           "cols_per_s_device": round(t_count / full_ms * 1e3)}
    print(json.dumps(out), flush=True)
    return out


def main():
    import emspec.dsp.fourstep as fs
    from emspec.dsp.pallas import fft4
    print(json.dumps({"backend": jax.default_backend(),
                      "production_factor": fs._FACTORS[8192]}), flush=True)

    a1 = measure("A1_(64,128)_production")

    # ---- B: (128, 64), step-1 K at full MXU depth ---------------------
    orig_supported = fft4.supported
    fft4.supported = lambda n1, n2: n1 >= 64 and n2 >= 64
    set_factor((128, 64))
    from emspec.dsp.pallas.validate import validate_deposits
    try:
        validate_deposits(8192)
        print(json.dumps({"parity_(128,64)": "ok"}), flush=True)
        b = measure("B_(128,64)")
    except Exception as e:  # Mosaic rejection or parity failure is a result
        print(json.dumps({"B_failed": f"{type(e).__name__}: {e}"}),
              flush=True)
        b = None
    finally:
        fft4.supported = orig_supported
        set_factor((64, 128))

    a2 = measure("A2_(64,128)_again")

    if b is not None:
        base = min(a1["deposits_ms"], a2["deposits_ms"])
        print(json.dumps({
            "deposits_speedup_(128,64)_vs_best_A":
                round(base / b["deposits_ms"], 3),
            "full_speedup": round(min(a1["full_ms"], a2["full_ms"])
                                  / b["full_ms"], 3),
            "session_drift_A1_vs_A2":
                round(a1["deposits_ms"] / a2["deposits_ms"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
