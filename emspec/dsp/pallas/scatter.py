"""Pallas TPU kernel: fused one-hot-matmul histogram (the reassignment
scatter-add) — the hottest op of the pipeline (SURVEY.md §3.2: the one op
XLA won't fuse well; §7 hard part 1).

Data-dependent scatters don't vectorize on TPU's VPU; the TPU-native
formulation is a *histogram as matmul*: for a chunk of deposits with ids
``i`` and values ``v``, build the one-hot matrix ``O[m, s] = [i_m == s]``
in VMEM on the fly and contract ``v @ O`` on the MXU.  The one-hot tile
never exists in HBM — the kernel streams (ids, vals) chunks in and keeps a
(1, S_tile) accumulator resident, so HBM traffic is just the inputs once
and the output once.

Grid: ``(B, S_tiles, M_chunks)`` — the output tile is revisited across the
M_chunks (innermost) dimension and accumulated in place.  The default
s_tile covers the display scatter space (P·rows ≤ 4608) in ONE tile so
each (ids, vals) chunk streams through VMEM exactly once — measured ~2×
faster than 1024-wide s-tiles on the stress shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hist_kernel(ids_ref, vals_ref, out_ref, *, s_tile: int):
    """One (batch-row, s-tile, m-chunk) step: accumulate the chunk's
    histogram contribution for this target tile.

    A histogram is a vector@matrix product (M = 1): the MXU's sublane
    rows can't be filled with independent batch rows because each row
    needs its own one-hot matrix, so batch parallelism lives in the grid
    instead."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    s0 = pl.program_id(1) * s_tile
    ids = ids_ref[0]                                      # (1, MC) int32
    mc = ids.shape[-1]
    # one-hot (MC, S_tile) built on the fly in VMEM, contracted on MXU
    cols = jax.lax.broadcasted_iota(jnp.int32, (mc, s_tile), 1)
    onehot = (jnp.broadcast_to(ids.reshape(mc, 1) - s0, (mc, s_tile))
              == cols).astype(jnp.float32)
    out_ref[0] += jnp.dot(vals_ref[0], onehot,
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_bins", "m_chunk", "s_tile"))
def histogram_matmul(ids: jnp.ndarray, vals: jnp.ndarray, num_bins: int,
                     m_chunk: int = 1024, s_tile: int = 4608) -> jnp.ndarray:
    """Scatter-add ``vals`` into ``num_bins`` cells keyed by ``ids``.

    ids:  (..., M) int32 in [0, num_bins) — out-of-range ids contribute
          nothing (their one-hot row is all-zero), so callers can encode
          "dropped" deposits as id = -1 instead of masking values.
    vals: (..., M) float32
    →     (..., num_bins) float32

    Equivalent to ``jax.ops.segment_sum`` per leading element, but runs as
    MXU matmuls with on-the-fly one-hot tiles (no sort, no serialized
    scatter, no HBM materialization).
    """
    lead = ids.shape[:-1]
    m = ids.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    ids2 = ids.reshape(b, m)
    vals2 = vals.reshape(b, m).astype(jnp.float32)

    mc = min(m_chunk, _round_up(m, 128))
    m_pad = _round_up(m, mc)
    if m_pad != m:
        # pad with id = -1 (contributes nothing)
        ids2 = jnp.pad(ids2, ((0, 0), (0, m_pad - m)), constant_values=-1)
        vals2 = jnp.pad(vals2, ((0, 0), (0, m_pad - m)))
    st = min(s_tile, _round_up(num_bins, 128))
    s_pad = _round_up(num_bins, st)
    # dim-1 middle axis: blocks of (1, 1, mc) are legal because the block's
    # second-to-last dim equals the array's
    ids3 = ids2.reshape(b, 1, m_pad)
    vals3 = vals2.reshape(b, 1, m_pad)

    grid = (b, s_pad // st, m_pad // mc)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, s_tile=st),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, mc), lambda bi, si, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mc), lambda bi, si, mi: (bi, 0, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, st), lambda bi, si, mi: (bi, 0, si),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, s_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * (4 * mc * st)) + (1 << 21),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_pad * s_pad,
            bytes_accessed=b * (8 * m_pad + 4 * s_pad),
            transcendentals=0,
        ),
    )(ids3, vals3)
    return out[:, 0, :num_bins].reshape(lead + (num_bins,))


def histogram_reference(ids, vals, num_bins):
    """segment_sum formulation — the correctness baseline the kernel is
    parity-tested against (SURVEY.md §7 hard part 1: 'keep both')."""
    lead = ids.shape[:-1]

    def one(i, v):
        safe = jnp.where((i >= 0) & (i < num_bins), i, num_bins)
        masked = jnp.where((i >= 0) & (i < num_bins), v, 0.0)
        return jax.ops.segment_sum(masked, safe, num_segments=num_bins + 1)[:num_bins]

    if lead:
        b = int(np.prod(lead))
        out = jax.vmap(one)(ids.reshape(b, -1), vals.reshape(b, -1))
        return out.reshape(lead + (num_bins,))
    return one(ids.reshape(-1), vals.reshape(-1))
