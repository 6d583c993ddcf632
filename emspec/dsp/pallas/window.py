"""Pallas TPU kernel: fused triple-windowing (L2).

[NS north_star: "a fused Pallas kernel performs windowing (Hann plus the
time-weighted t·h(t) and derivative dh/dt auxiliary windows)"].

Each analysis frame must be multiplied by all three reassignment windows.
Done naively that reads the frame data three times from HBM; this kernel
reads each frame tile into VMEM **once** and writes the three windowed
copies in the same pass — HBM traffic drops from 3R+3W to 1R+3W frame
sizes (the windows themselves are tiny constants resident per tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emspec.dsp.pallas import check_jax_compat

check_jax_compat()   # warn once on Mosaic/jax version drift (pin in __init__)

from emspec.dsp.windows import window_triple


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(frames_ref, w3_ref, out_ref):
    f = frames_ref[:]                      # (TT, NT)
    w = w3_ref[:]                          # (3, NT)
    out_ref[:] = f[None, :, :] * w[:, None, :]


@functools.partial(jax.jit, static_argnames=("t_tile", "n_tile"))
def windowed_frames(frames: jnp.ndarray, t_tile: int = 128,
                    n_tile: int = 1024) -> jnp.ndarray:
    """frames (..., T, N) float32 → (3, ..., T, N): [h, t·h, dh/dn] applied.

    Matches ``frames[None] * window_triple(N).reshape(3, 1, N)`` exactly
    (same float32 multiply), parity-tested in tests/test_pallas.py.
    """
    if frames.ndim == 1:
        # streaming passes single windows (n,) — the frame axis is optional
        return windowed_frames(frames[None, :], t_tile, n_tile)[:, 0, :]
    n = frames.shape[-1]
    lead = frames.shape[:-2]
    t = frames.shape[-2]
    b = int(np.prod(lead)) if lead else 1
    f2 = frames.reshape(b * t, n).astype(jnp.float32)
    w3 = jnp.asarray(window_triple(n))

    tt = min(t_tile, _round_up(b * t, 8))
    rows_pad = _round_up(b * t, tt)
    if rows_pad != b * t:
        f2 = jnp.pad(f2, ((0, rows_pad - b * t), (0, 0)))
    nt = min(n_tile, n)
    if n % nt:               # guaranteed by Settings validation (powers of
        nt = n               # two ≥ 256) — but never silently drop a tail

    out = pl.pallas_call(
        _kernel,
        grid=(rows_pad // tt, n // nt),
        in_specs=[
            pl.BlockSpec((tt, nt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, nt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tt, nt), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=8 * (tt * nt * 5) + (2 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * rows_pad * n,
            bytes_accessed=4 * (rows_pad * n * 4 + 3 * n),
            transcendentals=0,
        ),
    )(f2, w3)
    return out[:, :b * t, :].reshape((3,) + lead + (t, n))
