"""Scrolling waterfall: device-resident image ring (L4).

Reference behavior: a new column per hop scrolls at "Scroll Speed"
(README.md:44; assets/spectrogram.png shows the horizontal time axis).
The image ring lives on device and is updated in place with donated
buffers; only a full-image read-out (or nothing at all, in benchmarks)
crosses to the host (SURVEY.md §2.3 "scrolling waterfall").

Scroll-speed semantics (docs/DESIGN.md §9): analysis cadence (hop) is
fixed — Scroll Speed is a *display* rate in pixel-columns per hop.
speed 1.0 → every hop paints one pixel column; 0.5 → every second hop
paints the **average** of the two analyzed columns (energy-preserving
decimation — round 1 discarded the off-phase columns); 2.0 → each hop
paints two (duplicated) columns, scrolling twice as fast.  At speed 1.0
the painted column is bit-identical to the emitted column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _advance(buf, head, column, steps):
    """Paint ``column`` into ``steps`` successive ring slots (traced)."""
    def body(i, carry):
        b, h = carry
        b = jax.lax.dynamic_update_index_in_dim(b, column, h, axis=0)
        return b, jnp.mod(h + 1, b.shape[0])
    return jax.lax.fori_loop(0, steps, body, (buf, head))


def _mean_u8(acc, n):
    """Rounded mean of the accumulated float columns → uint8."""
    return jnp.round(acc / n).astype(jnp.uint8)


class Waterfall:
    """Fixed-width scrolling raster of RGBA columns."""

    def __init__(self, width: int, rows: int, scroll_speed: float = 1.0):
        self.width = int(width)
        self.rows = int(rows)
        self.scroll_speed = float(scroll_speed)
        self._buf = jnp.zeros((self.width, self.rows, 4), jnp.uint8)
        self._head = jnp.int32(0)
        self._phase = 0.0          # fractional columns owed (host scalar)
        self._acc = None           # float32 sum of columns since last paint
        self._acc_n = 0
        self._advance = jax.jit(_advance, donate_argnums=0, static_argnums=3)
        self._mean = jax.jit(_mean_u8, static_argnums=1)

    def add_column(self, rgba_column: jax.Array) -> None:
        """rgba_column: (rows, 4) uint8 (device). Paints 0+ pixel columns
        according to scroll speed; stays on device.  Sub-1 speeds average
        every analyzed column into the painted pixel (nothing analyzed is
        discarded)."""
        if rgba_column.ndim != 2:
            raise ValueError(
                f"add_column expects one (rows, 4) column, got shape "
                f"{rgba_column.shape} — for multichannel streams pass one "
                f"channel (e.g. col.rgba[ch])")
        self._phase += self.scroll_speed
        steps = int(self._phase)
        self._phase -= steps
        if steps == 0:
            # fractional speed: bank this column for the next painted
            # pixel (speeds >= 1 never reach here — zero extra device
            # ops on the common path, painted column stays bit-identical)
            if self._acc is None:
                self._acc = rgba_column.astype(jnp.float32)
                self._acc_n = 1
            else:
                self._acc = self._acc + rgba_column.astype(jnp.float32)
                self._acc_n += 1
            return
        if self._acc is not None:
            column = self._mean(self._acc + rgba_column.astype(jnp.float32),
                                self._acc_n + 1)
            self._acc = None
            self._acc_n = 0
        else:
            column = rgba_column
        self._buf, self._head = self._advance(
            self._buf, self._head, column, steps)

    def image(self) -> np.ndarray:
        """Host copy, oldest column left, bass at the bottom: (rows, width, 4)."""
        buf = np.asarray(self._buf)          # (width, rows, 4)
        head = int(self._head)
        ordered = np.concatenate([buf[head:], buf[:head]], axis=0)
        return ordered.transpose(1, 0, 2)[::-1]
