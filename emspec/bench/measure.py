"""Shared scan-marginal device-timing scaffold (BENCH.md methodology).

This environment's remote-TPU relay defers execution (block_until_ready
is not a barrier) and adds a time-varying 2.5–4.4 ms dispatch floor per
host→device call.  The one reliable way to time device work here:

1. put k evaluations inside ONE jit via ``lax.scan``, chained through a
   loop-carried value so XLA can neither dedupe nor hoist them;
2. force with a host fetch of a chained scalar;
3. take the *marginal* between two chain lengths, which cancels the
   per-chain dispatch + fetch overhead;
4. report the median of several repetitions.

Every scan-marginal measurement in the tree (per-call, per-hop,
per-stage) goes through :func:`chain_marginal_ms` so methodology fixes
land in one place.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax


def chain_marginal_ms(f: Callable, make_carry: Callable, k: int,
                      reps: int = 5, long: int = 9, short: int = 3,
                      extra: int = 9) -> float:
    """Median marginal milliseconds per scanned step.

    f: a jitted ``carry → carry`` whose body scans k chained steps; every
       step's result must feed the returned carry (the first leaf is
       fetched to force the whole chain).
    make_carry: fresh initial carry per timed chain.
    k: steps scanned inside one ``f`` call.
    """
    def chain(iters: int) -> float:
        c = make_carry()
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(c)
        leaf = jax.tree_util.tree_leaves(c)[0]
        _ = np.asarray(leaf).ravel()[0]                    # force
        return time.perf_counter() - t0

    def sample() -> float:
        return (chain(long) - chain(short)) / (long - short) / k * 1e3

    _ = chain(1)                                           # compile + warm
    samples = [sample() for _ in range(reps)]
    # turbulence guard (BENCH.md item 33): the tunnel occasionally enters
    # windows where individual chain timings swing ±50% — one 5-sample
    # median recorded a physically impossible per-call cost.  When the
    # spread says the window is noisy, buy more samples: the median of
    # reps+extra is far more stable under heavy-tailed timing noise.
    med = float(np.median(samples))
    spread = (max(samples) - min(samples)) / max(abs(med), 1e-9)
    if spread > 0.3 or med <= 0.0:
        samples += [sample() for _ in range(extra)]
        med = float(np.median(samples))
    if med <= 0.0:
        # jitter still exceeds the chains' work delta: longer chains once,
        # then the whole-chain time per step — overhead-inclusive, so a
        # conservative UNDERestimate of speed, but positive and honest
        # (mirrors _throughput's relay-marginal fallback; never emit ≤ 0)
        long2 = long * 4
        med = float(np.median(
            [(chain(long2) - chain(short)) / (long2 - short) / k * 1e3
             for _ in range(3)]))
        if med <= 0.0:
            med = chain(long2) / long2 / k * 1e3
    return med


def probe_chain(fn: Callable, *args):
    """Wrap ``fn(x, *rest)`` as a probe-chained scan step: the carried f32
    probe multiplies the first argument by (1 + 0·probe) — a value-level
    dependency XLA cannot remove — and the next probe is a zeroed scalar
    of the result's first leaf."""
    import jax.numpy as jnp

    def step(probe):
        out = fn(args[0] * (1.0 + 0.0 * probe), *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[0].astype(jnp.float32) * 0.0

    return step
