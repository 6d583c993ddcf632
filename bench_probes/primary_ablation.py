"""Roofline closure for the PRIMARY scored config (round-3 VERDICT #1).

primary-8192 (mono, 48 kHz, enhanced single-bank, the driver's `value`)
is the only production config without an item-31-grade closure: publish
its %-of-peak, ablate the two hot kernels (`fft4_deposits`,
`histogram_matmul`) at the 8192 shape exactly as item 31 did for
stress, and either find a lever or record the structural accept.

What this probe measures (all scan-marginal, fetch-forced, median —
BENCH.md methodology):

1. full `_batch_vis` per-call device cost at the pinned 16 s shape
   (t=372) — the capability number the driver records;
2. cumulative stage prefixes (frames → deposits → scatter → post → LUT)
   at the same shape, via emspec.bench.stages;
3. each hot kernel STANDALONE at its exact production shape —
   `fft4_deposits(reach=R)` on the real frames, `histogram_matmul` on
   the real (ids, contrib, S);
4. the roofline model's per-stage FLOPs/bytes at those shapes → implied
   TFLOP/s and GB/s per kernel, reported against BOTH axes (bf16 MXU
   peak and HBM peak) so the binding axis is explicit (VERDICT #2).

Run from /root/repo (TPU backend): python -m bench_probes.primary_ablation
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from emspec.bench.harness import _signal
from emspec.bench.measure import chain_marginal_ms, probe_chain
from emspec.bench.roofline import (V5E_BF16_TFLOPS, V5E_HBM_GBS,
                                   stage_costs)
from emspec.config import Settings
from emspec.pipeline import Pipeline
from emspec.post.chain import PostState

SECONDS = 16.0          # the pinned saturating batch (BENCH.md item 37)


def scan_ms(fn, *args, k=16):
    """Device cost of fn(*args) via k chained scanned calls in one jit."""
    step = probe_chain(fn, *args)
    f = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (step(cc), None), c, None, length=k)[0])
    return chain_marginal_ms(f, lambda: jnp.float32(0.0), k)


def main():
    s = Settings(mode="enhanced", multires=False, fft_size=8192)
    pipe = Pipeline(s)
    x = _signal(SECONDS, s.sample_rate, 1)
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    xd = jax.device_put(x)
    st = PostState.init((pipe.rows,))
    R = pipe.reach
    S = (2 * R + 1) * pipe.rows

    report = {"t_count": t_count, "reach": R, "rows": pipe.rows, "S": S,
              "use_pallas_scatter": pipe.use_pallas_scatter,
              "fused_deposits": pipe._use_fused_deposits(s.fft_size)}
    print(json.dumps(report), flush=True)

    # ---- 1. full batch step ------------------------------------------------
    full_ms = scan_ms(
        lambda x: pipe._batch_vis(x, p, st, t_count)[:2], xd, k=8)
    print(f"full _batch_vis: {full_ms:.4f} ms/call "
          f"({t_count / full_ms * 1e3:,.0f} cols/s device)", flush=True)

    # ---- 2. stage prefixes at the same shape -------------------------------
    from emspec.bench.stages import stage_breakdown
    stages = stage_breakdown(s, seconds=SECONDS)
    print(json.dumps(stages), flush=True)

    # ---- 3a. deposits kernel standalone ------------------------------------
    def deposits(x):
        return pipe._deposit_ids_rel(pipe._bank_inputs(x, t_count), p)

    dep_ms = scan_ms(deposits, xd, k=8)

    # ---- 3b. scatter kernel standalone at the REAL (ids, contrib) ----------
    ids, contrib = jax.jit(deposits)(xd)
    ids = jax.device_put(np.asarray(ids))
    contrib = jax.device_put(np.asarray(contrib))
    from emspec.dsp.pallas.scatter import histogram_matmul
    sc_ms = scan_ms(
        lambda c: histogram_matmul(ids, c, S), contrib, k=8)
    print(f"deposits standalone: {dep_ms:.4f} ms/call   "
          f"scatter standalone: {sc_ms:.4f} ms/call   "
          f"ids shape {ids.shape}", flush=True)

    # ---- 4. model-implied efficiency per kernel ----------------------------
    costs = stage_costs(pipe)
    out = {"full_ms": full_ms, "deposits_ms": dep_ms, "scatter_ms": sc_ms,
           "stage_us": stages["stage_us"], "kernels": {}}
    for name, ms in (("analysis", dep_ms), ("scatter", sc_ms)):
        st_c = costs[name]
        fl = st_c["flops"] * t_count     # per call
        by = st_c["bytes"] * t_count
        tf = fl / (ms / 1e3) / 1e12
        gb = by / (ms / 1e3) / 1e9
        out["kernels"][name] = {
            "model_gflops_per_call": round(fl / 1e9, 3),
            "model_mb_per_call": round(by / 1e6, 2),
            "implied_tflops": round(tf, 1),
            "pct_bf16_peak": round(100 * tf / V5E_BF16_TFLOPS, 1),
            "implied_gbs": round(gb, 1),
            "pct_hbm_peak": round(100 * gb / V5E_HBM_GBS, 1),
        }
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
