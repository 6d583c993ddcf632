"""Pallas TPU kernel: colormap LUT lookup as a one-hot MXU matmul.

The display chain ends in a 256-entry RGBA table lookup per pixel —
an elementwise gather, the classic TPU trap (BENCH.md optimization log
#1): measured 2.2 ms for the multires raster (1437×512 px), ~30% of the
whole pipeline call.  The TPU-native formulation mirrors the scatter
kernel in reverse: build the one-hot ``O[e, m] = [idx_m == e]`` in VMEM
and contract ``tableᵀ @ O`` on the MXU — (4, 256) @ (256, m) per chunk.

Exactness: uint8 table entries (0..255) are exactly representable in
bf16 and each one-hot column has a single nonzero, so every output
element IS the table entry — bit-equal to the gather, which keeps the
streaming ≡ batch byte-equal RGBA contract intact even though the
streaming path (single columns, too small to win) keeps the gather.
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


def _lut_kernel(idx_ref, tab_ref, out_ref):
    idx = idx_ref[0]                                   # (1, MC) int32
    mc = idx.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, mc), 0)
    onehot = (rows == jnp.broadcast_to(idx, (256, mc))
              ).astype(jnp.float32).astype(jnp.bfloat16)
    out_ref[0] = jnp.dot(tab_ref[:], onehot,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("m_chunk",))
def lut_lookup(idx: jnp.ndarray, table: jnp.ndarray,
               m_chunk: int = 16384) -> jnp.ndarray:
    """idx (...,) int32 in [0, 256) + table (256, 4) uint8 → (..., 4) uint8.

    Equal to ``table[idx]`` bit-for-bit (single-nonzero bf16-exact
    contraction); runs as MXU matmuls instead of a per-pixel gather."""
    shape = idx.shape
    flat = idx.reshape(-1)
    npix = flat.shape[0]
    mc = min(m_chunk, -(-npix // 128) * 128)
    n_pad = -(-npix // mc) * mc
    if n_pad != npix:
        flat = jnp.pad(flat, (0, n_pad - npix))
    idx3 = flat.reshape(-1, 1, mc)
    nb = idx3.shape[0]
    tab_t = table.astype(jnp.bfloat16).T               # (4, 256), exact

    out = pl.pallas_call(
        _lut_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, mc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, mc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 4, mc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=8 * mc * (256 + 8) + (2 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 256 * 4,
            bytes_accessed=n_pad * 8 + 1024,
            transcendentals=0,
        ),
    )(idx3, tab_t)
    rgba = jnp.moveaxis(out, 1, -1).reshape(n_pad, 4)[:npix]
    return rgba.astype(jnp.uint8).reshape(shape + (4,))
