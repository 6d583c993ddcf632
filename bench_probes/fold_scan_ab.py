"""Why did the padded-slice fold regress the SCAN probe while improving
the relay marginal?

Post-fold multires measured: relay marginal 1.25 ms/call (better than
the pre-fold 1.35 ms device scan) but `_device_scan_ms_per_call` 2.17 ms
(worse).  The relay marginal and the scan probe run the SAME program in
different execution contexts (per-call dispatch vs `lax.scan` body), so
one of the two fold formulations must behave differently inside a scan.

This probe measures the multires batch call under BOTH methodologies for
BOTH fold variants (padded-slice sum vs the previous at[].add passes),
interleaved, same session.

Run: python -m bench_probes.fold_scan_ab
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from emspec.bench.measure import chain_marginal_ms
from emspec.bench.harness import _signal, _device_scan_ms_per_call
from emspec.config import Settings
from emspec.pipeline import Pipeline
import emspec.pipeline as plmod
from emspec.post.chain import PostState


def fold_padded(hist, t_count, R):
    P = 2 * R + 1
    pad = [(R, R)] + [(0, 0)] * (hist.ndim - 1)
    hp = jnp.pad(hist, pad)
    return sum(hp[2 * R - j:2 * R - j + t_count, ..., j, :]
               for j in range(P))


def fold_at_add(hist, t_count, R):
    P = 2 * R + 1
    out = jnp.zeros((t_count,) + hist.shape[1:-2] + (hist.shape[-1],),
                    jnp.float32)
    for j in range(P):
        dlt = j - R
        seg = hist[..., j, :]
        span = t_count - abs(dlt)
        if span <= 0:
            continue
        if dlt >= 0:
            out = out.at[dlt:dlt + span].add(seg[:span])
        else:
            out = out.at[:span].add(seg[-dlt:-dlt + span])
    return out


def make_scatter(fold):
    def _scatter_pallas(self, ids_rel, contrib, t_count, R=None):
        from emspec.dsp.pallas.scatter import histogram_matmul
        if R is None:
            R = self.reach
        P = 2 * R + 1
        hist = histogram_matmul(ids_rel, contrib, P * self.rows,
                                passes=self.settings.scatter_passes)
        hist = hist.reshape(hist.shape[:-1] + (P, self.rows))
        hist = jnp.moveaxis(hist, -3, 0)
        return jnp.moveaxis(fold(hist, t_count, R), 0, -2)
    return _scatter_pallas


def relay_marginal_ms(pipe, xd, p, st, t_count, reps=5):
    def chain(it, st_c):
        t0 = time.perf_counter()
        for _ in range(it):
            _, _, st_c = pipe._batch_jit(xd, p, st_c, t_count)
        _ = np.asarray(st_c.agc_ref)
        return time.perf_counter() - t0

    chain(1, st)
    est = chain(4, st) / 4
    hi = int(np.clip(np.ceil(1.0 / max(est, 1e-5)), 8, 1024))
    lo = max(hi // 4, 2)
    samples = []
    for _ in range(reps):
        t_lo = chain(lo, st)
        t_hi = chain(hi, st)
        samples.append((t_hi - t_lo) / (hi - lo))
    return float(np.median(samples)) * 1e3


def main():
    s = Settings(mode="enhanced", multires=True)
    results = {}
    for name, fold in [("padded", fold_padded), ("at_add", fold_at_add)]:
        plmod.Pipeline._scatter_pallas = make_scatter(fold)
        pipe = Pipeline(s)
        x = _signal(4.0, s.sample_rate, s.channels)
        xd = jax.device_put(x)
        t_count = pipe.num_columns(x.shape[-1])
        p = pipe.params()
        st = PostState.init((pipe.rows,))
        relay = relay_marginal_ms(pipe, xd, p, st, t_count)
        scan = _device_scan_ms_per_call(pipe, xd, p, st, t_count, k=8)
        scan2 = _device_scan_ms_per_call(pipe, xd, p, st, t_count, k=8)
        results[name] = (relay, scan, scan2)
        print(f"{name}: relay_marginal {relay:.3f} ms/call, "
              f"scan {scan:.3f} / {scan2:.3f} ms/call", flush=True)
    return results


if __name__ == "__main__":
    main()
