"""Pipeline builder: settings → fused jitted hop→raster functions (L2–L4 glue).

This is the product's hot path (SURVEY.md §3.2).  One ``Pipeline`` object
per structural-settings combination; continuous sliders are members of the
``PipelineParams`` pytree and never recompile (SURVEY.md §3.3).

Display-path design for the multires banks [NS configs[2]]:

* **Natural mode**: per-bank |X_h|² → precomputed gather/lerp merge onto
  the log-frequency rows with raised-cosine band crossfades
  (``emspec.dsp.multires``).
* **Enhanced mode**: the reassignment scatters **directly onto the display
  grid** — row index from the inverse log-frequency map of the reassigned
  frequency f̂, column offset from Δt/hop.  One scatter, no second
  interpolation pass: sharper (reassigned energy is a 2-D histogram on
  the raster, which is what the reference's sharpened display is) and
  cheaper on TPU.  Band crossfade weights are evaluated at the *source*
  bin frequency (that is where each bank's reliability is defined) [INF].

Per-unit normalization: each bank's power is scaled 1/N² so a stationary
tone displays equally bright through any bank (Hann coherent power gain
is N²/4; the residual 4 is absorbed by the Gain slider).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from emspec.config import MODE_ENHANCED, Settings
from emspec.dsp.frame import frame_signal, num_frames, signal_blocks
from emspec.dsp.multires import (
    MergeTables, band_support_hz, band_weight_at, bank_offsets,
    build_merge_tables, merge_columns,
)
from emspec.dsp.reassign import reassignment_corrections
from emspec.dsp.stft import stft_triple_stencil
from emspec.dsp.windows import window_triple, hann
from emspec.post.chain import (
    PostParams, PostState, postprocess_batch, postprocess_column,
)
from emspec.post.colormap import apply_lut, lut

# Largest relative scatter space S = P·rows where the Pallas histogram
# kernel beats XLA's segment_sum lowering on TPU v5e — measured crossover
# (BENCH.md; past it the digit one-hot build and M-tiling outgrow the
# scatter).  Shared by the global policy (use_pallas_scatter) and the
# per-bank mixed scatter.
PALLAS_SCATTER_MAX_S = 16384


class PipelineParams(NamedTuple):
    """Everything continuous: post-chain params + merge tables as arrays.
    Swapping any of these (slider moves, colormap change, Freq-Scale zoom)
    re-uses the compiled step."""
    post: PostParams
    lut: jnp.ndarray                 # (256, 4) uint8
    # enhanced-mode row map:  row = (log2(f_hz) - a) * b
    logmap_a: jnp.ndarray            # scalar: log2(f_min)
    logmap_b: jnp.ndarray            # scalar: rows_per_log2
    # natural-mode merge tables (per bank)
    i0: tuple                        # (rows,) int32
    w0: tuple                        # (rows,) float32
    band_rows: tuple                 # (rows,) float32 band weight per row
    band_bins: tuple                 # (K_b,) float32 band weight per source bin
    power_floor: jnp.ndarray         # scalar: drop |X_h|^2 below this
                                     # (Settings.reassign_floor_db)


class _Blocks:
    """Marker for a bank whose pruned STFT consumes hop blocks directly
    (emspec.dsp.stft.stft_triple_stencil_blocks) — the (t, n) frames
    array is never materialized.  Lives only inside one trace: created
    by Pipeline._bank_inputs, consumed by Pipeline._deposits."""
    __slots__ = ("x2", "t", "n")

    def __init__(self, x2, t: int, n: int):
        self.x2 = x2
        self.t = t
        self.n = n


def _row_map_consts(tables: MergeTables, rows: int):
    f = tables.row_freqs
    a = np.log2(f[0])
    b = (rows - 1) / (np.log2(f[-1]) - np.log2(f[0]))
    return np.float32(a), np.float32(b)


class Pipeline:
    """Compiled analysis+display pipeline for one structural configuration."""

    def __init__(self, settings: Settings):
        s = settings
        self.settings = s
        self.sizes = s.active_fft_sizes
        self.hop = s.hop_samples
        self.offsets = bank_offsets(self.sizes)
        self.n_max = max(self.sizes)
        self.rows = s.raster_height
        self.tables = build_merge_tables(
            self.sizes, s.sample_rate, self.rows, s.freq_min, s.freq_scale,
            s.crossover_low, s.crossover_high)
        self.row_freqs = self.tables.row_freqs
        # per-bank active bin range: outside its band support a bank's
        # weight is exactly zero, so those bins are sliced away before the
        # corrections+scatter (measured: ~93% of multires deposits were
        # zero-weight; the scatter was 93% of the pipeline cost)
        self.k_slices = []
        n_banks = len(self.sizes)
        for b, n in enumerate(self.sizes):
            k_count = n // 2 + 1
            if n_banks == 1:
                self.k_slices.append((0, k_count))
                continue
            lo_hz, hi_hz = band_support_hz(
                b, n_banks, s.crossover_low, s.crossover_high,
                s.sample_rate / 2.0)
            bin_hz = s.sample_rate / n
            k_lo = max(int(np.floor(lo_hz / bin_hz)) - 1, 0)
            k_hi = min(int(np.ceil(hi_hz / bin_hz)) + 2, k_count)
            self.k_slices.append((k_lo, k_hi))
        if n_banks == 1:
            # the fused deposits kernel assumes the single-bank band
            # weight is identically 1 (partition-of-unity with one part)
            probe = band_weight_at(
                np.linspace(1.0, s.sample_rate / 2.0, 64), 0, 1,
                s.crossover_low, s.crossover_high)
            assert np.all(probe == 1.0), "single-bank band weight != 1"
        self._batch_jit = jax.jit(self._batch_vis, static_argnames=("t_count",))
        # the canonical streaming executables, shared by Stream and
        # prewarm() so warming actually hits the cache the live stream
        # will use.  _stream_jit takes the full analysis window (bench
        # scan-marginal, ShardedStream); _stream_roll_jit is the
        # production Stream entry — the window lives in the carry and
        # only the `hop` new samples cross host→device per hop (the
        # H2D floor is the audio rate itself; BENCH.md item 45)
        self._stream_jit = jax.jit(self._stream_step, donate_argnums=0)
        self._stream_roll_jit = jax.jit(self._stream_step_rolling,
                                        donate_argnums=0)

    @property
    def use_pallas_scatter(self) -> bool:
        s = self.settings.scatter
        if s == "auto":
            # Measured on TPU v5e (round 2, hi/lo digit kernel): pallas wins
            # big while the relative scatter space P·rows stays one M-tile
            # deep (8192 single-bank: 0.52 vs 3.2 ms/call, 6×; stress: 2×);
            # at P=129 (multires small-hop, S=66k → s_hi=520) the digit
            # one-hot build and M-tiling outgrow XLA's scatter lowering
            # (14.3 vs 9.9 ms/call) — crossover re-measured in BENCH.md.
            return (jax.default_backend() == "tpu"
                    and (2 * self.reach + 1) * self.rows <= PALLAS_SCATTER_MAX_S)
        return s == "pallas"

    def _use_fused_deposits(self, n: int) -> bool:
        """Fused FFT→deposits kernel policy: enhanced single-bank on TPU
        under the resolved fourstep engine with an MXU-shaped
        factorization (the same domain where fourstep already owns the
        tolerance contract — DESIGN.md §5)."""
        from emspec.dsp import fourstep
        from emspec.dsp.pallas import fft4
        if (self.settings.fft_method != "stencil"
                or self.fft_impl != "fourstep"
                or len(self.sizes) != 1
                or jax.default_backend() != "tpu"
                or not fourstep.supported(n)):
            return False
        n1, n2 = fourstep._FACTORS[n]
        return fft4.supported(n1, n2)

    def _use_pruned_dft(self, n: int, k_lo: int, k_hi: int) -> bool:
        """Pruned-DFT-as-GEMM policy: a band-sliced bank keeping K bins
        costs 8·n·(K+2) GEMM flops vs ~5·n·log2(n) FFT flops per frame —
        but the MXU runs the GEMM at an order of magnitude higher
        throughput than the memory-bound FFT, so the crossover sits far
        above the flop-parity point.  Threshold measured on TPU v5e
        (BENCH.md): GEMM wins while (K+2)·8 ≤ n.  Full-range banks
        (K = n/2+1) never qualify, so natural mode and single-bank
        enhanced keep the exact rfft path.

        TPU-only: on CPU the GEMM's accumulation order shifts with the
        batch dimension (cache blocking) in the last float32 bit, which
        would break the streaming ≡ batch bit-exactness contract the CPU
        suite pins — and CPU throughput doesn't matter.  The MXU's
        K-tiling is batch-independent; tests/test_tpu.py asserts the
        streaming ≡ batch contract on the real chip."""
        return (jax.default_backend() == "tpu"
                and (k_hi - k_lo + 2) * 8 <= n)

    @property
    def fft_impl(self) -> str:
        """Resolved FFT engine ("fourstep" | "xla") — see Settings.fft_impl.

        Measured policy (TPU v5e, BENCH.md round 2, after the einsum+flip
        fourstep rework): the packed-pair four-step FFT wins enhanced
        single-bank configs (8192: 137k vs 108k cols/s; 16ch stress:
        2,457 vs 1,825) — that's where one large complex transform
        dominates the step.  Multires measures a tie (the pruned-DFT GEMM
        already took the long banks), and natural mode loses 3×
        (batched-real rfft is already optimal), so both resolve to "xla",
        whose rfft is bitwise batch-shape-stable.  Streaming ≡ batch is
        BIT-exact on every path without batch-shape-sensitive GEMMs
        (pinned by the CPU suite); on TPU the pruned-DFT banks agree to
        float32 ulp (measured ≤1e-7 rel — tests/test_tpu.py documents
        the exact contract).  "fourstep" stays selectable everywhere
        supported (float32-tolerance parity, tested)."""
        from emspec.dsp import fourstep
        s = self.settings.fft_impl
        if s == "auto":
            if (jax.default_backend() == "tpu"
                    and self.settings.mode == MODE_ENHANCED
                    and len(self.sizes) == 1
                    and fourstep.supported(self.sizes[0])):
                return "fourstep"
            return "xla"
        if s == "fourstep" and not all(fourstep.supported(n) for n in self.sizes):
            raise ValueError(f"fourstep FFT unsupported for sizes {self.sizes}")
        return s

    # ---------------- params ----------------
    def params(self, settings: Settings | None = None) -> PipelineParams:
        """Build the continuous-param pytree (cheap; call on slider moves)."""
        s = settings or self.settings
        tables = self.tables
        if s.freq_scale != self.settings.freq_scale:
            tables = build_merge_tables(
                self.sizes, s.sample_rate, self.rows, s.freq_min, s.freq_scale,
                s.crossover_low, s.crossover_high)
        a, b = _row_map_consts(tables, self.rows)
        band_bins = []
        n_banks = len(self.sizes)
        for bank_idx, n in enumerate(self.sizes):
            k_lo, k_hi = self.k_slices[bank_idx]
            bin_f = np.arange(k_lo, k_hi) * (s.sample_rate / n)
            # band weight per source bin, evaluated analytically (exactly
            # zero outside the sliced support — zoom-independent)
            band_bins.append(band_weight_at(
                bin_f, bank_idx, n_banks, s.crossover_low, s.crossover_high,
            ).astype(np.float32))
        return PipelineParams(
            post=PostParams.from_settings(s, tables.row_freqs),
            lut=jnp.asarray(lut(s.colormap)),
            logmap_a=jnp.float32(a), logmap_b=jnp.float32(b),
            i0=tuple(jnp.asarray(i) for i in tables.i0),
            w0=tuple(jnp.asarray(w) for w in tables.w0),
            band_rows=tuple(jnp.asarray(w) for w in tables.band_w),
            band_bins=tuple(jnp.asarray(w) for w in band_bins),
            power_floor=jnp.float32(10.0 ** (s.reassign_floor_db / 10.0)),
        )

    # ---------------- analysis ----------------
    def _bank_frames(self, x: jnp.ndarray, t_count: int):
        """Center-aligned per-bank frames: bank b frame t covers
        [offset_b + t*hop, … + N_b) so all columns share their center."""
        out = []
        for n, off in zip(self.sizes, self.offsets):
            end = off + (t_count - 1) * self.hop + n
            out.append(frame_signal(x[..., off:end], n, self.hop))
        return out

    def _bank_inputs(self, x: jnp.ndarray, t_count: int):
        """Per-bank analysis inputs for the BATCH enhanced path: banks
        taking the pruned-DFT route get raw hop blocks (framing folds
        into the block GEMM — the m-way frame concat measured 3.5 ms at
        the multires 8192-bank shape, over half the call), everything
        else gets materialized frames as before."""
        out = []
        for n, off, (k_lo, k_hi) in zip(self.sizes, self.offsets,
                                        self.k_slices):
            end = off + (t_count - 1) * self.hop + n
            xb = x[..., off:end]
            if (t_count > 0
                    and self.settings.mode == MODE_ENHANCED
                    and self.settings.fft_method == "stencil"
                    and not self._use_fused_deposits(n)
                    and self._use_pruned_dft(n, k_lo, k_hi)):
                out.append(_Blocks(signal_blocks(xb, n, self.hop),
                                   t_count, n))
            else:
                out.append(frame_signal(xb, n, self.hop))
        return out

    def _bank_power(self, frames: jnp.ndarray, n: int) -> jnp.ndarray:
        """Hann |X|^2 of one bank's frames/window — the single definition
        both the batch and streaming natural paths share (so they cannot
        silently diverge).

        Non-finite scrub (the natural path's poisoning guard): one
        NaN/Inf capture sample NaNs every bin of its frame's spectrum;
        unscrubbed, that NaN reaches ``peak_db`` and permanently poisons
        the AGC reference EMA (``post/chain.py`` stage 4) — every later
        column would be NaN for process lifetime.  Zeroing non-finite
        power here renders the affected columns black and recovers as
        soon as the bad sample leaves the analysis window, matching the
        enhanced path's immunity (its deposit validity mask already
        zeroes non-finite contribs).  For finite inputs the ``where`` is
        an exact identity, so the bit-exact streaming ≡ batch pins are
        untouched.  Mirrored in ``tests/oracle.py`` (invariants
        contract); the reference app runs indefinitely on live system
        audio [OBS: README.md:36] so the state must be unpoisonable."""
        w = jnp.asarray(hann(n))
        if self.fft_impl == "fourstep":
            from emspec.dsp.fourstep import rfft_fourstep
            X = rfft_fourstep(frames * w)
        else:
            X = jnp.fft.rfft(frames * w, axis=-1)
        power = (X.real**2 + X.imag**2).astype(jnp.float32)
        return jnp.where(jnp.isfinite(power), power, 0.0)

    def _natural_power(self, x, t_count, p: PipelineParams):
        specs = [self._bank_power(frames, n)
                 for frames, n in zip(self._bank_frames(x, t_count), self.sizes)]
        tables = MergeTables(self.row_freqs,
                             tuple(p.i0), tuple(p.w0), tuple(p.band_rows))
        return merge_columns(tuple(specs), tables)          # (..., t, rows)

    def _deposits(self, frames_list, p: PipelineParams):
        """Shared by batch and streaming: per-bank frames (..., N_b) →
        flattened ``(row, col_delta, contrib)`` each (..., ΣK_b).

        ``col_delta = round(Δt/hop)`` is the *relative* column offset —
        the caller adds its own absolute column index and applies its own
        column-range mask (contrib is already zeroed for every other
        invalidity: sub-floor power, out-of-axis row, |Δt| > N/2)."""
        rows_l, delta_l, contrib_l = self._deposits_banked(frames_list, p)
        cat = lambda parts: jnp.concatenate(
            [a.reshape(a.shape[:-1] + (-1,)) for a in parts], axis=-1)
        return cat(rows_l), cat(delta_l), cat(contrib_l)

    def _deposits_banked(self, frames_list, p: PipelineParams):
        """_deposits without the final concat: three lists of per-bank
        arrays (row, delta, contrib), each (..., K_b) — the per-bank
        scatter (``_scatter_mixed``) needs bank identity to use each
        bank's own reach."""
        sr = float(self.settings.sample_rate)
        rows_l, delta_l, contrib_l = [], [], []
        for frames, n, bb, (k_lo, k_hi) in zip(
                frames_list, self.sizes, p.band_bins, self.k_slices):
            if isinstance(frames, _Blocks):
                # batch pruned bank: framing folded into the block GEMM
                from emspec.dsp.stft import stft_triple_stencil_blocks
                power, dt, dw = reassignment_corrections(
                    *stft_triple_stencil_blocks(frames.x2, frames.t, n,
                                                k_lo, k_hi))
                X = None
            elif self._use_fused_deposits(n):
                # single-bank TPU fast path: FFT + unpack + stencil +
                # corrections + quantize fused in one VMEM kernel
                # (emspec.dsp.pallas.fft4.fft4_deposits); deposit order is
                # (k1,k2)-major — a permutation the scatter is invariant
                # to.  Single bank ⇒ band weight ≡ 1 (asserted at
                # construction), so bb never enters.
                from emspec.dsp.pallas.fft4 import fft4_deposits
                lead = frames.shape[:-1]
                row, delta, contrib = fft4_deposits(
                    frames.reshape(-1, n), p.logmap_a, p.logmap_b,
                    p.power_floor, n=n, hop=self.hop, sr=sr,
                    rows=self.rows)
                rows_l.append(row.reshape(lead + (-1,)))
                delta_l.append(delta.reshape(lead + (-1,)))
                contrib_l.append(contrib.reshape(lead + (-1,)))
                continue
            if isinstance(frames, _Blocks):
                pass                      # power/dt/dw computed above
            elif (self.settings.fft_method == "stencil"
                    and self._use_pruned_dft(n, k_lo, k_hi)):
                # band-sliced bank keeps K ≪ n/2 bins: the pruned DFT is
                # one MXU GEMM straight to the kept bins — no full FFT,
                # no slice (emspec.dsp.stft.stft_triple_stencil_sliced);
                # the batch path folds the framing in too (_Blocks above)
                from emspec.dsp.stft import stft_triple_stencil_sliced
                power, dt, dw = reassignment_corrections(
                    *stft_triple_stencil_sliced(frames, k_lo, k_hi))
                X = None
            elif self.settings.fft_method == "stencil":
                # NOTE (measured, round 2): reformulating the stencil as
                # interior slices + edge columns to avoid the concat-
                # shifted Xm1/Xp1 materializations made stress 38% SLOWER
                # — minor-dim ±1 slices are lane-shift copies on TPU too,
                # and there are three of them vs two concats.  The concat
                # formulation stays.
                X = stft_triple_stencil(frames, self.fft_impl)
            else:
                if jax.default_backend() == "tpu":
                    # direct method on TPU: fused Pallas triple-window
                    # kernel (one frame read, three windowed writes)
                    from emspec.dsp.pallas.window import windowed_frames
                    windowed = windowed_frames(frames)
                else:
                    w3 = jnp.asarray(window_triple(n))
                    shaped = w3.reshape((3,) + (1,) * (frames.ndim - 1) + (n,))
                    windowed = frames[None, ...] * shaped
                if self.fft_impl == "fourstep":
                    from emspec.dsp.fourstep import rfft_fourstep
                    Xs = rfft_fourstep(windowed)
                else:
                    Xs = jnp.fft.rfft(windowed, axis=-1)
                X = (Xs[0], Xs[1], Xs[2])
            if X is not None:
                # slice to the bank's band support (zero weight outside):
                # corrections + scatter skip the dead bins entirely
                X = tuple(a[..., k_lo:k_hi] for a in X)
                power, dt, dw = reassignment_corrections(*X)
            k_idx = jnp.arange(k_lo, k_hi, dtype=jnp.float32)
            f_hat = (k_idx + dw * (n / (2.0 * np.pi))) * (sr / n)   # Hz
            delta = jnp.round(dt / float(self.hop)).astype(jnp.int32)
            row_f = (jnp.log2(jnp.maximum(f_hat, 1e-6)) - p.logmap_a) * p.logmap_b
            row = jnp.round(row_f).astype(jnp.int32)
            valid = (
                (power > p.power_floor)
                & (row >= 0) & (row < self.rows)
                & (f_hat > 0)
                & (jnp.abs(dt) <= float(n) / 2.0)
            )
            contrib = jnp.where(valid, power * bb * (1.0 / float(n * n)), 0.0)
            rows_l.append(jnp.clip(row, 0, self.rows - 1))
            delta_l.append(delta)
            contrib_l.append(contrib)
        return rows_l, delta_l, contrib_l

    def _deposit_ids_rel(self, frames_list, p: PipelineParams):
        """Deposits as relative-histogram inputs ``(ids_rel, contrib)``
        with ``ids_rel = (δ + R)·rows + row``.  On the fused single-bank
        TPU path the packing happens in the analysis kernel's epilogue
        (no XLA pass over the deposits); otherwise it's one elementwise
        map over the unfused triple."""
        R = self.reach
        n = self.sizes[0]
        if len(self.sizes) == 1 and self._use_fused_deposits(n):
            from emspec.dsp.pallas.fft4 import fft4_deposits
            frames = frames_list[0]
            lead = frames.shape[:-1]
            ids, contrib = fft4_deposits(
                frames.reshape(-1, n), p.logmap_a, p.logmap_b,
                p.power_floor, n=n, hop=self.hop,
                sr=float(self.settings.sample_rate), rows=self.rows,
                reach=R)
            return (ids.reshape(lead + (-1,)),
                    contrib.reshape(lead + (-1,)))
        rows_i, delta, contrib = self._deposits(frames_list, p)
        return (delta + R) * self.rows + rows_i, contrib

    @property
    def use_mixed_scatter(self) -> bool:
        """Batch multibank TPU route: per-bank scatter, each bank with its
        own reach (see _scatter_mixed).  TPU-only — per-bank summation
        would break the CPU suite's bit-exact pin."""
        return (len(self.sizes) > 1 and jax.default_backend() == "tpu"
                and self.settings.scatter != "segment_sum")

    def _enhanced_power(self, x, t_count, p: PipelineParams,
                        frame_valid=None):
        """Reassigned 2-D histogram directly on the (t, rows) display grid.

        ``frame_valid``: optional (t,) float mask zeroing the deposits of
        frames that exist only as analysis halo (time-sharded rendering,
        ``emspec.parallel.TimeParallelRenderer``): a shard's local frame
        range extends past the global [0, t_count) to recompute boundary
        deposits, and a trailing PARTIAL frame — one the global batch
        never analyzes because its window ends past the signal — must
        not deposit into the kept columns."""
        frames_list = self._bank_inputs(x, t_count)

        def fmask(c):                                  # (..., t, K)
            return c if frame_valid is None else c * frame_valid[:, None]

        if self.use_mixed_scatter:
            # multibank batch: per-bank scatter, each with its own reach
            rows_l, delta_l, contrib_l = self._deposits_banked(
                frames_list, p)
            contrib_l = [fmask(c) for c in contrib_l]
            return self._scatter_mixed((rows_l, delta_l, contrib_l),
                                       t_count, x.shape[:-1])
        if self.use_pallas_scatter:
            # contrib is (..., t, K) on both the fused and unfused
            # builders (the fused kernel reshapes back to the frame
            # leading dims), so the frame mask broadcasts directly
            ids_rel, contrib = self._deposit_ids_rel(frames_list, p)
            return self._scatter_pallas(ids_rel, fmask(contrib), t_count)
        rows_i, delta, contrib = self._deposits(frames_list, p)
        return self._scatter_segment_sum(rows_i, delta, fmask(contrib),
                                         t_count, x.shape[:-1])

    def _scatter_mixed(self, banked, t_count, lead):
        """Per-bank scatter for the batch multibank path: bank b's
        deposits can only move |δ| ≤ R_b = round(N_b/(2·hop)) columns, so
        each bank scatters into its OWN (2R_b+1, rows) relative space
        instead of the global (2R+1, rows) one sized by the longest
        bank.  Each bank picks pallas vs segment_sum by the same measured
        S = P_b·rows crossover as the global policy; at the default
        multires config (rows 512, hop 128) with the round-3 |Δt| ≤ N/2
        reaches: bank 512 → P=5 pallas, bank 2048 → P=17 (S=8704, now
        under the crossover → pallas; at the round-2 P=33 it measured a
        0.97 vs 0.98 tie), bank 8192 → P=65, m=43 segment_sum (small m,
        huge S was 0.45 vs 6.6 segment_sum territory at P=129).

        TPU-only (the batch caller gates): per-bank summation reorders
        the f32 cell accumulation vs the global single segment_sum, which
        would break the CPU suite's streaming ≡ batch bit-exact pin; on
        TPU the contract is tolerance-level already (tests/test_tpu.py).
        ``scatter="pallas"`` forces pallas for every bank;
        ``"segment_sum"`` never reaches here."""
        rows_l, delta_l, contrib_l = banked
        force_pallas = self.settings.scatter == "pallas"
        out = None
        for row, delta, contrib, n in zip(rows_l, delta_l, contrib_l,
                                          self.sizes):
            R_b = int(np.round(n / (2.0 * self.hop)))
            if force_pallas or (2 * R_b + 1) * self.rows <= PALLAS_SCATTER_MAX_S:
                ids_rel = (delta + R_b) * self.rows + row
                part = self._scatter_pallas(ids_rel, contrib, t_count,
                                            R=R_b)
            else:
                part = self._scatter_segment_sum(row, delta, contrib,
                                                 t_count, lead)
            out = part if out is None else out + part
        return out

    def _scatter_segment_sum(self, rows_i, delta, contrib, t_count, lead):
        """Correctness-baseline scatter: one flattened segment_sum over the
        absolute (t, rows) grid (shared histogram_reference formulation —
        the quantization contract lives in exactly one place per backend)."""
        from emspec.dsp.pallas.scatter import histogram_reference

        t_idx = jnp.arange(t_count, dtype=jnp.int32)[:, None]
        col = t_idx + delta
        ids = jnp.where((col >= 0) & (col < t_count),
                        col * self.rows + rows_i, -1)
        flat_ids = ids.reshape(lead + (-1,)) if lead else ids.reshape(-1)
        flat_vals = (contrib.reshape(lead + (-1,)) if lead
                     else contrib.reshape(-1))
        out = histogram_reference(flat_ids, flat_vals, t_count * self.rows)
        return out.reshape(lead + (t_count, self.rows))

    def _scatter_pallas(self, ids_rel, contrib, t_count, R: int | None = None):
        """TPU fast path: per-frame *relative* histograms on the MXU
        (one-hot matmul kernel, emspec.dsp.pallas.scatter) + a static
        shift-add over the 2R+1 possible column offsets.  No
        data-dependent scatter remains anywhere in the hot path.
        ids_rel/contrib come from ``_deposit_ids_rel`` (out-of-range ids
        fall outside [0, P·rows) and contribute nothing).  ``R`` defaults
        to the pipeline reach; the per-bank mixed scatter passes each
        bank's own (smaller) reach."""
        from emspec.dsp.pallas.scatter import histogram_matmul

        if R is None:
            R = self.reach
        P = 2 * R + 1
        hist = histogram_matmul(ids_rel, contrib, P * self.rows,
                                    passes=self.settings.scatter_passes)
        hist = hist.reshape(hist.shape[:-1] + (P, self.rows))  # (..., t, P, rows)
        hist = jnp.moveaxis(hist, -3, 0)                       # (t, ..., P, rows)
        # Fold out[u] = Σ_j hist[u-(j-R), j]: zero-pad t by R on both
        # sides once, then ONE fused elementwise sum of P static slices.
        # The previous P sequential ``out.at[slice].add`` passes each
        # re-read and re-wrote the whole (t, rows) output — ~3·P·t·rows·4
        # bytes of HBM traffic vs one read of hist + one write of out
        # here; measured 1.63×/1.39× on the multires 2048/512 banks and
        # BIT-exact (same values added in the same j order per cell;
        # bench_probes/scatter_variants_ab.py).  Out-of-range targets
        # fall in the zero padding, which also covers t_count ≤ R.
        pad = [(R, R)] + [(0, 0)] * (hist.ndim - 1)
        hp = jnp.pad(hist, pad)                                # (t+2R, ...)
        out = sum(hp[2 * R - j:2 * R - j + t_count, ..., j, :]
                  for j in range(P))
        return jnp.moveaxis(out, 0, -2)                        # (..., t, rows)

    # ---------------- full batch path ----------------
    def _batch_vis(self, x, p: PipelineParams, state: PostState, t_count: int):
        power = (self._enhanced_power(x, t_count, p)
                 if self.settings.mode == MODE_ENHANCED
                 else self._natural_power(x, t_count, p))    # (..., t, rows)
        cols_first = jnp.moveaxis(power, -2, 0)              # (t, ..., rows)
        # vectorized post chain (bit-identical to the per-column scan the
        # streaming step uses — see postprocess_batch)
        vis, state = postprocess_batch(cols_first, state, p.post,
                                       self.settings.agc_global)
        rgba = apply_lut(vis, p.lut)                          # (t, ..., rows, 4)
        return vis, rgba, state

    def num_columns(self, num_samples: int) -> int:
        return num_frames(num_samples, self.n_max, self.hop)

    # ---------------- streaming path (per-hop step, SURVEY.md §3.2) ----------
    @property
    def reach(self) -> int:
        """R: max columns the time-reassignment can move energy.

        Δt is the first moment of time over the window support
        [−N/2, N/2] (Auger–Flandrin; DESIGN.md §3), so |Δt| ≤ N/2 for
        any physical component — larger excursions are interference/
        noise artifacts the validity mask drops (round-3 spec
        tightening from |Δt| ≤ N: halves P = 2R+1 scatter spaces AND
        the streaming emit latency).  |δ| ≤ round(N/(2·hop)); natural
        mode never moves energy: R = 0."""
        if self.settings.mode != MODE_ENHANCED:
            return 0
        return max(int(np.round(n / (2.0 * self.hop))) for n in self.sizes)

    def _bank_windows(self, window: jnp.ndarray):
        """Single analysis window (..., N_max) → center-aligned per-bank
        slices (..., N_b)."""
        return [window[..., off:off + n]
                for n, off in zip(self.sizes, self.offsets)]

    def _stream_step(self, carry, window, p: PipelineParams):
        """One hop: scatter this frame's deposits into the pending ring of
        P = 2R+1 columns, then emit column t−R (final: no later frame can
        reach it).  Post-chain state only advances on real emissions, so a
        stream followed by ``flush`` reproduces the batch scan exactly
        (SURVEY.md §4.4 streaming ≡ batch)."""
        t, acc, post = carry                     # acc: (P, ..., rows)
        R = self.reach
        P = 2 * R + 1
        lead = window.shape[:-1]

        if self.settings.mode == MODE_ENHANCED:
            if self.use_pallas_scatter:
                # relative histogram, then rotate into the pending ring:
                # acc slot of offset δ is (t+δ) mod P = roll by (t−R) mod P
                from emspec.dsp.pallas.scatter import histogram_matmul
                ids_rel, contrib = self._deposit_ids_rel(
                    self._bank_windows(window), p)
                # negative absolute columns can't land: t + δ ≥ 0 ⟺
                # ids_rel ≥ (R − t)·rows (row < rows makes these exactly
                # equivalent — same mask as the unfused t + delta >= 0)
                contrib = jnp.where(ids_rel >= (R - t) * self.rows,
                                    contrib, 0.0)
                hist = histogram_matmul(ids_rel, contrib, P * self.rows,
                                    passes=self.settings.scatter_passes)
                hist = hist.reshape(hist.shape[:-1] + (P, self.rows))
                dep = jnp.moveaxis(hist, -2, 0)                 # (P, ..., rows)
                dep = jnp.roll(dep, t - R, axis=0)
            else:
                from emspec.dsp.pallas.scatter import histogram_reference
                rows_i, delta, contrib = self._deposits(
                    self._bank_windows(window), p)
                contrib = jnp.where(t + delta >= 0, contrib, 0.0)
                slot = jnp.mod(t + delta, P)
                ids = slot * self.rows + rows_i
                dep = histogram_reference(ids, contrib, P * self.rows)
                dep = dep.reshape(dep.shape[:-1] + (P, self.rows))
                dep = jnp.moveaxis(dep, -2, 0)          # (P, ..., rows)
            acc = acc + dep
        else:
            specs = [self._bank_power(win, n)
                     for win, n in zip(self._bank_windows(window), self.sizes)]
            tables = MergeTables(self.row_freqs,
                                 tuple(p.i0), tuple(p.w0), tuple(p.band_rows))
            col = merge_columns(tuple(specs), tables)       # (..., rows)
            acc = acc.at[jnp.mod(t, P)].add(col)

        emit_slot = jnp.mod(t - R, P)
        emit_power = acc[emit_slot]                          # (..., rows)
        vis, new_post = postprocess_column(emit_power, post, p.post,
                                           self.settings.agc_global)
        do_emit = t >= R
        post = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_emit, new, old), new_post, post)
        vis = jnp.where(do_emit, vis, 0.0)
        rgba = apply_lut(vis, p.lut)
        acc = acc.at[emit_slot].set(0.0)                     # slot reused by t+R+1
        return (t + 1, acc, post), (vis, rgba, t - R)

    def _stream_step_rolling(self, carry, block, p: PipelineParams):
        """H2D-minimal streaming hop: the analysis window is carry
        state; ``block`` is only the ``hop`` NEW samples.

        window' = concat(window[hop:], block) reproduces exactly the
        window `_stream_step` would have been fed, so streaming ≡ batch
        bit-exactness is inherited unchanged — the concat is pure data
        movement ahead of the identical step.  Rationale: per-hop
        windows overlap by (n_max − hop)/n_max; shipping the full
        window re-transfers every sample n_max/hop times (32× at the
        display default).  Keeping the window device-resident cuts
        host→device traffic to the information floor — the audio byte
        rate — which is both the TPU-first design (HBM/PCIe bandwidth
        is the scarce resource) and the fix for this environment's
        relay-client payload retention (BENCH.md item 45)."""
        window, inner = carry
        window = jnp.concatenate([window[..., self.hop:], block], axis=-1)
        inner, out = self._stream_step(inner, window, p)
        return (window, inner), out

    def init_stream_carry(self, lead: tuple = ()):
        P = 2 * self.reach + 1
        return (jnp.int32(0),
                jnp.zeros((P,) + lead + (self.rows,), jnp.float32),
                PostState.init(lead + (self.rows,)))

    def init_roll_carry(self, lead: tuple = ()):
        """Carry for :meth:`_stream_step_rolling`: (window, inner)."""
        return (jnp.zeros(lead + (self.n_max,), jnp.float32),
                self.init_stream_carry(lead))

    # ---------------- hover readout (SURVEY.md §3.5) ----------------
    def _axis(self, freq_scale: float | None) -> np.ndarray:
        """Row-frequency axis at the given zoom.  Freq Scale is a
        *continuous* slider: pass the current value (the construction-time
        ``self.row_freqs`` reflects only the zoom the Pipeline was built
        with; the display itself follows params())."""
        if freq_scale is None or freq_scale == self.settings.freq_scale:
            return self.row_freqs
        from emspec.dsp.multires import log_freq_axis
        s = self.settings
        return log_freq_axis(self.rows, s.freq_min, s.sample_rate / 2.0,
                             freq_scale)

    def frequency_at_row(self, row: int, freq_scale: float | None = None) -> float:
        """Display row (0 = bottom/bass) → center frequency in Hz —
        the inverse of the log-frequency axis at the given zoom."""
        return float(self._axis(freq_scale)[row])

    def row_of_frequency(self, freq_hz: float,
                         freq_scale: float | None = None) -> int:
        """Nearest display row for a frequency (hover inverse map)."""
        f = self._axis(freq_scale)
        r = (np.log2(max(freq_hz, 1e-9)) - np.log2(f[0])) \
            / (np.log2(f[-1]) - np.log2(f[0])) * (self.rows - 1)
        return int(np.clip(round(r), 0, self.rows - 1))

    def describe_row(self, row: int, freq_scale: float | None = None) -> str:
        """The Shift+hover tooltip text for a display row
        (reference: README.md:39 'note and frequency information')."""
        from emspec.utils.notes import describe_frequency
        return describe_frequency(self.frequency_at_row(row, freq_scale))

    def process(self, x, params: PipelineParams | None = None,
                state: PostState | None = None):
        """Whole-signal batch processing.

        x: (..., samples) → (vis (t, ..., rows), rgba uint8 (t, ..., rows, 4),
        final PostState).  Streaming ≡ batch: the scan inside evolves the
        identical per-column state as the streaming driver (SURVEY.md §4.4).
        """
        x = jnp.asarray(x, jnp.float32)
        t_count = self.num_columns(x.shape[-1])
        if t_count <= 0:
            raise ValueError(
                f"need at least {self.n_max} samples, got {x.shape[-1]}")
        p = params or self.params()
        st = state or PostState.init(x.shape[:-1] + (self.rows,))
        return self._batch_jit(x, p, st, t_count)


# Sized for the prewarm set (7 dropdown sizes + the multires variant,
# × enhanced/natural) with headroom for structural churn — a gain tweak
# must never evict a just-warmed executable (tests/test_ops.py pins the
# prewarm set staying resident).
@functools.lru_cache(maxsize=32)
def _cached_pipeline(settings: Settings) -> Pipeline:
    return Pipeline(settings)


def _structural_projection(s: Settings) -> Settings:
    """Settings with every continuous field reset to its default — the
    cache key.  Two Settings that differ only in sliders share one
    compiled Pipeline (otherwise a gain tweak before an FFT-size switch
    would miss the prewarm()ed executable and stall the live stream for a
    full compile)."""
    from emspec.config import STRUCTURAL_FIELDS
    defaults = Settings()
    import dataclasses
    cont = {f.name: getattr(defaults, f.name)
            for f in dataclasses.fields(Settings)
            if f.name not in STRUCTURAL_FIELDS}
    return s.replace(**cont)


def get_pipeline(settings: Settings) -> Pipeline:
    """Pipeline cache keyed by the *structural* projection of Settings —
    pre-warming the dropdown's FFT-size set amounts to calling this for
    each size (SURVEY.md §7 hard part 3).  NOTE: the returned Pipeline's
    ``.settings`` carries default continuous values; always build params
    with YOUR settings (``pipe.params(settings)``)."""
    return _cached_pipeline(_structural_projection(settings))


class WarmHandle:
    """Handle over the queued per-variant warm jobs.  ``cancel()`` drops
    every variant that hasn't started compiling yet — an app quitting
    mid-warm must not hang interpreter exit behind the rest of the
    dropdown (one in-flight compile still finishes; the executor's
    atexit join waits only for that)."""

    def __init__(self, futures):
        self.futures = list(futures)

    def result(self, timeout: float | None = None):
        import time as _time
        deadline = None if timeout is None else _time.monotonic() + timeout
        for f in self.futures:
            left = (None if deadline is None
                    else max(0.0, deadline - _time.monotonic()))
            f.result(left)

    def done(self) -> bool:
        return all(f.done() for f in self.futures)

    def cancel(self) -> None:
        for f in self.futures:
            f.cancel()


def prewarm(base: Settings, sizes: tuple | None = None,
            background: bool = True):
    """Pre-compile the streaming step for every FFT size in the dropdown so
    a size change never stalls the live stream (SURVEY.md §7 hard part 3;
    §3.3: structural changes re-specialize).

    Warms the single-bank variant for each ``size`` plus the multires
    variant once.  Returns a :class:`WarmHandle` (or None when
    ``background=False`` and warming ran inline).  Each variant is its
    own queued job so ``WarmHandle.cancel()`` can abandon the un-started
    remainder when the app shuts down mid-warm.
    """
    from emspec.config import FFT_SIZES

    sizes = sizes or FFT_SIZES
    variants = [base.replace(multires=False, fft_size=n) for n in sizes]
    if base.multires:
        variants.append(base)

    def _warm_one(s: Settings) -> None:
        pipe = get_pipeline(s)
        lead = (s.channels,) if s.channels > 1 else ()
        carry = pipe.init_roll_carry(lead)
        block = jnp.zeros(lead + (pipe.hop,), jnp.float32)
        jax.block_until_ready(
            pipe._stream_roll_jit(carry, block, pipe.params()))

    if background:
        pool = _warm_pool()
        return WarmHandle([pool.submit(_warm_one, s) for s in variants])
    for s in variants:
        _warm_one(s)
    return None


@functools.lru_cache(maxsize=1)
def _warm_pool():
    """One shared single-thread warmer: repeated prewarm() calls (every
    structural change in an app session) queue on the same worker instead
    of each leaking a fresh thread."""
    import concurrent.futures
    return concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="emspec-prewarm")


def render_image_multires(x, settings: Settings) -> np.ndarray:
    """Audio → (rows, t, 4) uint8 RGBA log-frequency image.

    Multichannel input renders ``settings.display_channel`` (single-view
    display, matching the app controller; see render_images_channels for
    the tiled all-channel output)."""
    pipe = get_pipeline(settings)
    _, rgba, _ = pipe.process(x, params=pipe.params(settings))
    img = np.asarray(rgba)            # (t, [ch,] rows, 4)
    if img.ndim == 4:
        img = img[:, settings.display_channel]
    return img.transpose(1, 0, 2)[::-1]


def render_images_channels(x, settings: Settings) -> list[np.ndarray]:
    """Multichannel audio (ch, samples) → one (rows, t, 4) log-frequency
    image per channel, from a single batched pipeline pass (the stress
    config's 16 rasters become inspectable — tile with
    ``emspec.render.png.tile_images``)."""
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[None]
    s = settings.replace(channels=x.shape[0], display_channel=0)
    pipe = get_pipeline(s)
    _, rgba, _ = pipe.process(x, params=pipe.params(s))
    img = np.asarray(rgba)            # (t, ch, rows, 4)
    if img.ndim == 3:
        img = img[:, None]
    return [img[:, c].transpose(1, 0, 2)[::-1] for c in range(img.shape[1])]
