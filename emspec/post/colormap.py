"""Colormap LUTs: display value in [0,1] → RGBA (L3→L4 boundary).

Reference evidence: README.md:15 ("Multiple color schemes"), README.md:45,
and the "Inferno" dropdown with gradient swatch in assets/settings.png;
assets/spectrogram.png is rendered in Inferno.  Ships the matplotlib-family
maps matching the swatch (inferno/magma/viridis/plasma/turbo) + grayscale.

The LUT is *data*, not structure: swapping colormaps never recompiles the
pipeline — the (256, 4) uint8 table is just another device argument
(SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from emspec.post._cmap_data import rgb_table

LUT_SIZE = 256


@functools.lru_cache(maxsize=None)
def lut(name: str) -> np.ndarray:
    """(256, 4) uint8 RGBA lookup table for the named colormap."""
    if name == "grayscale":
        g = np.arange(LUT_SIZE, dtype=np.uint8)
        rgb = np.stack([g, g, g], axis=1)
    else:
        rgb = rgb_table(name)
    alpha = np.full((LUT_SIZE, 1), 255, dtype=np.uint8)
    out = np.concatenate([rgb, alpha], axis=1)
    out.setflags(write=False)
    return out


def apply_lut(values: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """values in [0,1] (...,) + (256,4) uint8 table → (..., 4) uint8 RGBA
    [NS: "colormap LUT"].

    Nearest lookup.  Large rasters on TPU route through the one-hot MXU
    matmul kernel (emspec.dsp.pallas.lut) — per-pixel gathers are the
    measured TPU trap (2.2 ms for a 1437×512 raster; the kernel is
    bit-equal, see its docstring).  Small lookups (streaming single
    columns) and other backends keep the plain gather, which XLA fuses
    with the preceding post chain."""
    import jax

    idx = jnp.clip(
        jnp.round(values * (LUT_SIZE - 1)).astype(jnp.int32), 0, LUT_SIZE - 1
    )
    npix = int(np.prod(idx.shape)) if idx.shape else 1
    if jax.default_backend() == "tpu" and npix >= 16384:
        from emspec.dsp.pallas.lut import lut_lookup
        return lut_lookup(idx, table)
    return table[idx]
