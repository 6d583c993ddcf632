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

Sub-1 averaging happens **pre-LUT**, on the ``vis`` values the stream
emits alongside each RGBA column (VERDICT round-2 #4): the mean of
colormapped uint8 is *not* the colormap of the mean — through a
nonlinear LUT like inferno it lands on desaturated off-palette colors.
Callers therefore pass ``vis_column`` (and a ``lut_table``) so the
painted pixel is ``LUT(mean(vis))`` — always on the palette.  Legacy
RGBA-space averaging remains only as the fallback when no vis/LUT is
available (e.g. pre-rendered rasters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from emspec.post.colormap import apply_lut


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


def _mean_vis_lut(acc, vis, n, table):
    """LUT of the mean vis — the palette-correct fractional-speed pixel."""
    return apply_lut((acc + vis) / n, table)


class Waterfall:
    """Fixed-width scrolling raster of RGBA columns.

    ``lut_table``: optional (256, 4) uint8 colormap table.  With it set,
    fractional-speed averaging runs in vis space (pre-LUT) whenever the
    caller also passes ``vis_column`` — swap it on colormap changes (it is
    data, not structure; see app controller)."""

    def __init__(self, width: int, rows: int, scroll_speed: float = 1.0,
                 lut_table=None):
        self.width = int(width)
        self.rows = int(rows)
        self.scroll_speed = float(scroll_speed)
        self.lut_table = lut_table
        # unwritten slots are OPAQUE black (alpha 255), not transparent:
        # a PNG of a part-filled waterfall must read as "no signal yet"
        # (the colormap floor is black in every shipped map), not as the
        # viewer's white compositing background
        self._buf = jnp.zeros((self.width, self.rows, 4), jnp.uint8
                              ).at[..., 3].set(255)
        self._head = jnp.int32(0)
        self._phase = 0.0          # fractional columns owed (host scalar)
        self._acc = None           # float32 sum of columns since last paint
        self._acc_n = 0
        self._acc_is_vis = False   # True: _acc sums vis, not RGBA
        self._advance = jax.jit(_advance, donate_argnums=0, static_argnums=3)
        self._mean = jax.jit(_mean_u8, static_argnums=1)
        self._mean_vis = jax.jit(_mean_vis_lut, static_argnums=2)

    def add_column(self, rgba_column: jax.Array,
                   vis_column: jax.Array | None = None) -> None:
        """rgba_column: (rows, 4) uint8 (device); vis_column: the matching
        (rows,) float32 display values (``Column.vis``), enabling pre-LUT
        averaging.  Paints 0+ pixel columns according to scroll speed;
        stays on device.  Sub-1 speeds average every analyzed column into
        the painted pixel (nothing analyzed is discarded)."""
        if rgba_column.ndim != 2:
            raise ValueError(
                f"add_column expects one (rows, 4) column, got shape "
                f"{rgba_column.shape} — for multichannel streams pass one "
                f"channel (e.g. col.rgba[ch])")
        use_vis = vis_column is not None and self.lut_table is not None
        self._phase += self.scroll_speed
        steps = int(self._phase)
        self._phase -= steps
        if steps == 0:
            # fractional speed: bank this column for the next painted
            # pixel (speeds >= 1 never reach here — zero extra device
            # ops on the common path, painted column stays bit-identical)
            if self._acc is not None and self._acc_is_vis != use_vis:
                raise ValueError(
                    "mixed vis/RGBA columns within one fractional-speed "
                    "accumulation — pass vis_column (and set lut_table) "
                    "consistently for every column")
            banked = vis_column if use_vis else rgba_column
            if self._acc is None:
                self._acc = banked.astype(jnp.float32)
                self._acc_n = 1
                self._acc_is_vis = use_vis
            else:
                self._acc = self._acc + banked.astype(jnp.float32)
                self._acc_n += 1
            return
        if self._acc is not None:
            if self._acc_is_vis and use_vis:
                # palette-correct: LUT applied to the mean vis
                column = self._mean_vis(self._acc,
                                        vis_column.astype(jnp.float32),
                                        self._acc_n + 1,
                                        jnp.asarray(self.lut_table))
            elif not self._acc_is_vis and not use_vis:
                column = self._mean(
                    self._acc + rgba_column.astype(jnp.float32),
                    self._acc_n + 1)
            else:
                raise ValueError(
                    "mixed vis/RGBA columns within one fractional-speed "
                    "accumulation — pass vis_column (and set lut_table) "
                    "consistently for every column")
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
