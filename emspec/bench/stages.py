"""Per-stage timing breakdown (SURVEY.md §5.5: "per-stage μs").

Times cumulative pipeline prefixes (framing → FFT+corrections → scatter →
post chain → LUT) as separately-jitted functions and reports the
differences.  Prefix-timing measures each stage *with fusion context*
rather than in isolation, which is what actually matters under XLA.
Bench-mode only — every measurement fences the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emspec.config import MODE_ENHANCED, Settings
from emspec.pipeline import Pipeline
from emspec.post.chain import PostState, postprocess_batch
from emspec.post.colormap import apply_lut


def stage_breakdown(settings: Settings, seconds: float = 4.0) -> dict:
    from emspec.bench.harness import _signal

    pipe = Pipeline(settings)
    ch = settings.channels
    x = _signal(seconds, settings.sample_rate, ch)
    if ch == 1 and x.ndim > 1:
        x = x[0]
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    lead = (ch,) if ch > 1 else ()
    st = PostState.init(lead + (pipe.rows,))
    xd = jax.device_put(x)

    def upto_frames(x):
        # production path inputs; _Blocks banks surface their raw blocks
        return tuple(getattr(f, "x2", f)
                     for f in pipe._bank_inputs(x, t_count))

    def upto_deposits(x):
        # whichever deposits route production resolves to on this backend:
        # multibank TPU consumes the per-bank lists (_scatter_mixed — no
        # concat), fused single-bank emits packed ids, XLA path elsewhere
        fl = pipe._bank_inputs(x, t_count)
        if settings.mode != MODE_ENHANCED:
            return pipe._deposits(fl, p)
        if pipe.use_mixed_scatter:
            return pipe._deposits_banked(fl, p)
        if pipe.use_pallas_scatter:
            return pipe._deposit_ids_rel(fl, p)
        return pipe._deposits(fl, p)

    def upto_power(x):
        if settings.mode == MODE_ENHANCED:
            return pipe._enhanced_power(x, t_count, p)
        return pipe._natural_power(x, t_count, p)

    def upto_post(x, st):
        # the PRODUCTION batch post chain (vectorized block + unrolled /
        # associative EMA scans) — an earlier version scanned the naive
        # per-column chain here, overstating this stage ~3× at t=372
        power = upto_power(x)
        cols_first = jnp.moveaxis(power, -2, 0)
        return postprocess_batch(cols_first, st, p.post, settings.agc_global)

    def upto_lut(x, st):
        vis, st2 = upto_post(x, st)
        return apply_lut(vis, p.lut), st2

    def timed(fn, *args):
        """DEVICE-side prefix cost via the scan-marginal technique
        (emspec.bench.measure / BENCH.md methodology note 4).  Per-call
        dispatch marginals are useless here — the relay's 2.5–4.4 ms
        per-call floor is itself larger than most prefixes, and its
        drift made stage differences negative.  k = 32 scanned calls per
        dispatch puts sub-100 µs prefixes above the relay's ~±1 ms chain
        jitter (lax.scan compile time is length-independent);
        differences below ~30 µs are still noise — stage_us clamps at 0
        rather than reporting them negative."""
        from emspec.bench.measure import chain_marginal_ms, probe_chain

        k = 32
        step = probe_chain(fn, *args)
        f = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (step(cc), None), c, None, length=k)[0])
        return chain_marginal_ms(f, lambda: jnp.float32(0.0), k) * 1e3

    prefixes = {
        "frames": timed(upto_frames, xd),
        "fft+corrections+bins": timed(upto_deposits, xd),
        "scatter(power-grid)": timed(upto_power, xd),
        "post-chain-scan": timed(upto_post, xd, st),
        "lut": timed(upto_lut, xd, st),
    }
    names = list(prefixes)
    stages = {names[0]: prefixes[names[0]]}
    for a, b in zip(names, names[1:]):
        stages[b] = max(prefixes[b] - prefixes[a], 0.0)
    return {
        "t_count": t_count,
        "prefix_us": {k: round(v, 1) for k, v in prefixes.items()},
        "stage_us": {k: round(v, 1) for k, v in stages.items()},
    }


if __name__ == "__main__":
    import json
    cfg = Settings(mode="enhanced", multires=False, fft_size=8192)
    print(json.dumps(stage_breakdown(cfg), indent=2))
    cfg = Settings(mode="enhanced", multires=True)
    print(json.dumps(stage_breakdown(cfg), indent=2))