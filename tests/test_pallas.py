"""Pallas kernel parity tests (run in interpreter mode on the CPU suite;
the same kernels compile natively on TPU — SURVEY.md §7 hard part 1:
'keep both; parity-test one against the other')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from emspec.dsp.pallas.scatter import histogram_matmul, histogram_reference
from emspec.dsp.pallas.window import windowed_frames
from emspec.dsp.windows import window_triple


def _interp():
    return pltpu.force_tpu_interpret_mode()


# ------------------------------------------------------------- histogram
def test_histogram_matches_segment_sum():
    """Default 2-pass bf16 split stays inside its documented ≤2⁻¹⁶
    relative bound; passes=3 is f32-exact (DESIGN.md §7)."""
    rng = np.random.default_rng(0)
    m, s = 1000, 300
    ids = rng.integers(0, s, m).astype(np.int32)
    vals = rng.uniform(0, 1, m).astype(np.float32)
    want = np.asarray(histogram_reference(jnp.asarray(ids), jnp.asarray(vals), s))
    with _interp():
        got2 = np.asarray(histogram_matmul(jnp.asarray(ids), jnp.asarray(vals), s,
                                           m_chunk=256))
        got3 = np.asarray(histogram_matmul(jnp.asarray(ids), jnp.asarray(vals), s,
                                           m_chunk=256, passes=3))
    np.testing.assert_allclose(got2, want, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(got3, want, rtol=1e-6, atol=1e-6)


def test_histogram_negative_ids_dropped():
    ids = jnp.asarray([0, -1, 2, -1, 2], jnp.int32)
    vals = jnp.asarray([1.0, 5.0, 2.0, 7.0, 3.0], jnp.float32)
    with _interp():
        got = np.asarray(histogram_matmul(ids, vals, 4, m_chunk=128))
    np.testing.assert_allclose(got, [1.0, 0.0, 5.0, 0.0])


def test_histogram_dropped_ids_survive_nonfinite_vals():
    """The id = -1 ⇒ contributes-nothing contract must hold even when the
    dropped deposit's value is Inf/NaN: the M-stacked kernel multiplies
    mask·val, and an unsanitized 0·Inf would NaN-poison the whole row."""
    ids = jnp.asarray([0, -1, 2, -1], jnp.int32)
    vals = jnp.asarray([1.0, np.inf, 2.0, np.nan], jnp.float32)
    with _interp():
        got = np.asarray(histogram_matmul(ids, vals, 4, m_chunk=128))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, [1.0, 0.0, 2.0, 0.0])


def test_histogram_batched():
    rng = np.random.default_rng(1)
    b, m, s = 3, 517, 257           # awkward sizes exercise padding
    ids = rng.integers(-1, s, (b, m)).astype(np.int32)
    vals = rng.uniform(0, 1, (b, m)).astype(np.float32)
    want = np.asarray(histogram_reference(jnp.asarray(ids), jnp.asarray(vals), s))
    with _interp():
        got = np.asarray(histogram_matmul(jnp.asarray(ids), jnp.asarray(vals), s,
                                          m_chunk=256))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_histogram_empty_bins_and_total():
    rng = np.random.default_rng(2)
    m, s = 400, 100
    ids = rng.integers(0, 50, m).astype(np.int32)    # only lower half used
    vals = np.ones(m, np.float32)
    with _interp():
        got = np.asarray(histogram_matmul(jnp.asarray(ids), jnp.asarray(vals), s,
                                          m_chunk=128))
    assert got[50:].sum() == 0.0
    assert got.sum() == pytest.approx(m)


# ----------------------------------------------- pipeline backend parity
@pytest.mark.slow
def test_pipeline_batch_scatter_backends_agree():
    from emspec.config import Settings
    from emspec.pipeline import Pipeline
    from emspec.io import synth

    x = synth.chirp(100.0, 8000.0, 0.15) + synth.tone(440.0, 0.15, amplitude=0.3)
    base = dict(mode="enhanced", multires=True, multires_sizes=(1024, 512),
                raster_height=128, hop=256, auto_gain=False)
    ref_pipe = Pipeline(Settings(scatter="segment_sum", **base))
    want, _, _ = ref_pipe.process(x)
    with _interp():
        pal_pipe = Pipeline(Settings(scatter="pallas", **base))
        got, _, _ = pal_pipe.process(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_stream_scatter_backends_agree():
    from emspec.config import Settings
    from emspec.pipeline import Pipeline
    from emspec.io import synth

    base = dict(mode="enhanced", multires=True, multires_sizes=(1024, 512),
                raster_height=128, hop=256, auto_gain=False)
    x = synth.chirp(200.0, 4000.0, 0.08)

    def run(scatter):
        pipe = Pipeline(Settings(scatter=scatter, **base))
        carry = pipe.init_stream_carry(())
        p = pipe.params()
        outs = []
        n_hops = (len(x) - pipe.n_max) // pipe.hop + 1
        for t in range(n_hops):
            w = jnp.asarray(x[t * pipe.hop: t * pipe.hop + pipe.n_max])
            carry, (vis, _, _) = pipe._stream_step(carry, w, p)
            if t >= pipe.reach:
                outs.append(np.asarray(vis))
        return np.stack(outs)

    want = run("segment_sum")
    with _interp():
        got = run("pallas")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- LUT
def test_lut_matmul_bit_equal_to_gather():
    """The one-hot MXU LUT must equal table[idx] bit-for-bit (uint8
    entries are bf16-exact; single nonzero per one-hot column) — this is
    what keeps streaming ≡ batch RGBA byte-equal while only the batch
    path uses the kernel."""
    from emspec.dsp.pallas.lut import lut_lookup
    from emspec.post.colormap import lut

    rng = np.random.default_rng(14)
    for shape in ((1437, 128), (7, 333), (100,)):
        idx = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        for cmap in ("inferno", "turbo"):
            table = jnp.asarray(lut(cmap))
            with _interp():
                got = np.asarray(lut_lookup(idx, table))
            want = np.asarray(table)[np.asarray(idx)]
            np.testing.assert_array_equal(got, want)


# ------------------------------------------------------- fused fourstep
@pytest.mark.parametrize("n", [8192, 32768])
def test_fft4_kernel_matches_xla_fourstep_and_fft(n):
    """The fused steps-1–3 kernel must agree with the XLA four-step path
    and with jnp.fft to float32-class error (3-pass bf16 split)."""
    from emspec.dsp.fourstep import fft_fourstep

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    want_r, want_i = fft_fourstep(a, b, use_pallas=False)
    with _interp():
        got_r, got_i = fft_fourstep(a, b, use_pallas=True)
    ref = jnp.fft.fft(a + 1j * b, axis=-1)
    scale = float(jnp.abs(ref).max())
    for g, w in ((got_r, want_r), (got_i, want_i),
                 (got_r, ref.real), (got_i, ref.imag)):
        assert float(jnp.abs(g - w).max()) / scale < 2e-5


def test_fft4_streaming_single_frame_shape():
    """The streaming step passes a single window (lead=()); the kernel
    must handle b=1 (t_tile clamps)."""
    from emspec.dsp.fourstep import fft_fourstep

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(32768).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(32768).astype(np.float32))
    want_r, want_i = fft_fourstep(x, y, use_pallas=False)
    with _interp():
        got_r, got_i = fft_fourstep(x, y, use_pallas=True)
    assert got_r.shape == (32768,)
    scale = float(jnp.abs(want_r).max())
    assert float(jnp.abs(got_r - want_r).max()) / scale < 2e-5
    assert float(jnp.abs(got_i - want_i).max()) / scale < 2e-5


@pytest.mark.parametrize("n,hop,B", [
    (8192, 2048, 4),      # full-spectrum path (n2 = 128)
    (32768, 8192, 2),     # half-spectrum step-3 path (n2 = 256)
])
@pytest.mark.slow
def test_fft4_deposits_matches_unfused_path(n, hop, B):
    """The fused FFT→deposits kernel must reproduce the unfused
    stencil+corrections+quantize chain: deposits are order-permuted, so
    compare as histograms — total energy ≤1e-3 rel and 3×3 max-filter
    agreement (the DESIGN.md §9 quantized-scatter methodology; low-bit
    engine differences can move a deposit one cell).  The 32768 case
    exercises the half-spectrum step 3 (sliced tables + VPU Nyquist
    edge + conj-wrap stencil seams)."""
    from emspec.dsp.pallas.fft4 import fft4_deposits
    from emspec.dsp.reassign import reassignment_corrections
    from emspec.dsp.stft import stft_triple_stencil

    rng = np.random.default_rng(13)
    rows, sr = 128, 48000.0
    frames = jnp.asarray(
        (0.2 * rng.standard_normal((B, n))
         + np.sin(2 * np.pi * 440.0 / sr * np.arange(n))[None]
         ).astype(np.float32))
    a_ = np.float32(np.log2(20.0))
    b_ = np.float32((rows - 1) / (np.log2(24000.0) - np.log2(20.0)))
    floor = np.float32(1e-12)

    X = stft_triple_stencil(frames, "fourstep")
    power, dt, dw = reassignment_corrections(*X)
    k_idx = jnp.arange(n // 2 + 1, dtype=jnp.float32)
    f_hat = (k_idx + dw * (n / (2 * np.pi))) * (sr / n)
    delta_w = jnp.round(dt / hop).astype(jnp.int32)
    row_w = jnp.round((jnp.log2(jnp.maximum(f_hat, 1e-6)) - a_) * b_
                      ).astype(jnp.int32)
    valid = ((power > floor) & (row_w >= 0) & (row_w < rows)
             & (f_hat > 0) & (jnp.abs(dt) <= float(n) / 2.0))
    contrib_w = jnp.where(valid, power * (1.0 / (float(n) * n)), 0.0)
    row_w = jnp.clip(row_w, 0, rows - 1)

    with _interp():
        row_g, delta_g, contrib_g = fft4_deposits(
            frames, a_, b_, floor, n=n, hop=hop, sr=sr, rows=rows)

    R, P = 4, 9
    def hist(r, d, c):
        return np.asarray(histogram_reference(
            (d + R) * rows + r, c, P * rows)).reshape(B, P, rows)
    hw = hist(row_w, delta_w, contrib_w)
    hg = hist(row_g, delta_g, contrib_g)
    assert abs(hw.sum() - hg.sum()) / hw.sum() < 1e-3
    from scipy.ndimage import maximum_filter
    np.testing.assert_allclose(maximum_filter(hg, size=(1, 3, 3)),
                               maximum_filter(hw, size=(1, 3, 3)),
                               atol=1e-3 * hw.max())


# ------------------------------------------------------------- windowing
@pytest.mark.parametrize("shape", [(7, 512), (2, 5, 512), (90, 2048)])
def test_windowed_frames_parity(shape):
    rng = np.random.default_rng(3)
    frames = rng.standard_normal(shape).astype(np.float32)
    n = shape[-1]
    w3 = window_triple(n)
    want = frames[None] * w3.reshape((3,) + (1,) * (len(shape) - 1) + (n,))
    with _interp():
        got = np.asarray(windowed_frames(jnp.asarray(frames),
                                         t_tile=16, n_tile=512))
    assert got.shape == (3,) + shape
    np.testing.assert_allclose(got, want, atol=0)   # identical f32 multiply

def test_windowed_frames_1d_streaming_shape():
    """Streaming passes single windows (n,) — the kernel must accept the
    optional frame axis (regression: crashed the TPU direct-mode stream)."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal(512).astype(np.float32)
    with _interp():
        got = np.asarray(windowed_frames(jnp.asarray(w), t_tile=8, n_tile=512))
    want = w[None] * window_triple(512)
    assert got.shape == (3, 512)
    np.testing.assert_allclose(got, want, atol=0)


@pytest.mark.slow
def test_scatter_passes_knob():
    """scatter_passes wires through to the kernel: 1-pass stays within
    its documented bf16 display-grade bound, 3-pass matches segment_sum
    at f32 tightness."""
    from emspec.config import Settings
    from emspec.pipeline import Pipeline
    from emspec.io import synth

    base = dict(mode="enhanced", multires=False, fft_size=1024, hop=256,
                raster_height=128, auto_gain=False)
    x = synth.chirp(150.0, 6000.0, 0.1)
    want, _, _ = Pipeline(Settings(scatter="segment_sum", **base)).process(x)
    with _interp():
        got1, _, _ = Pipeline(Settings(scatter="pallas", scatter_passes=1,
                                       **base)).process(x)
        got3, _, _ = Pipeline(Settings(scatter="pallas", scatter_passes=3,
                                       **base)).process(x)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               rtol=0, atol=6e-3)


def test_pallas_scatter_short_signal():
    """Regression: the static shift-add crashed at trace time for
    2 <= t_count <= R-1 (slice-bound mismatch on short signals)."""
    from emspec.config import Settings
    from emspec.pipeline import Pipeline
    from emspec.io import synth

    s = Settings(mode="enhanced", multires=False, fft_size=1024, hop=128,
                 raster_height=128, scatter="pallas", auto_gain=False)
    pipe = Pipeline(s)
    assert pipe.reach >= 3
    x = synth.tone(440.0, (pipe.n_max + pipe.hop) / 48_000 + 1e-3)  # t=2
    with _interp():
        vis, _, _ = pipe.process(x)
    assert vis.shape[0] == 2
    ref = Pipeline(s.replace(scatter="segment_sum"))
    want, _, _ = ref.process(x)
    np.testing.assert_allclose(np.asarray(vis), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fft4_hist_matches_composed_path():
    """The fully fused analysis+scatter kernel (fft4_hist) reproduces
    fft4_deposits(reach) → histogram_reference, and its streaming mask
    drops exactly the ids below min_id.

    Status: checked-in MEASURED NEGATIVE RESULT (round-3 VERDICT #1,
    BENCH.md item 25): at production shapes on the chip the fused kernel
    is 0.94–1.02× the composed two-kernel path — the deposits HBM round
    trip is cheaper than any in-kernel reorientation of the (n1, k2)
    spectra tiles Mosaic can express (three variants measured, see
    bench_probes/fused_hist_ab.py).  The kernel stays correct and
    pinned here so the question stays closed with runnable evidence."""
    from emspec.dsp.pallas.fft4 import fft4_deposits, fft4_hist

    rng = np.random.default_rng(7)
    n, hop, B, rows, sr = 8192, 2048, 3, 128, 48000.0
    R = 2
    P = 2 * R + 1
    frames = jnp.asarray(
        (0.2 * rng.standard_normal((B, n))
         + np.sin(2 * np.pi * 0.25 * np.arange(n))       # near-Nyquist
         + np.sin(2 * np.pi * 440.0 / sr * np.arange(n))[None]
         ).astype(np.float32))
    a_ = np.float32(np.log2(20.0))
    b_ = np.float32((rows - 1) / (np.log2(24000.0) - np.log2(20.0)))
    floor = np.float32(1e-12)
    with _interp():
        ids, contrib = fft4_deposits(frames, a_, b_, floor, n=n, hop=hop,
                                     sr=sr, rows=rows, reach=R)
        want = np.asarray(histogram_reference(ids, contrib, P * rows))
        got = np.asarray(fft4_hist(frames, a_, b_, floor, -2**30, n=n,
                                   hop=hop, sr=sr, rows=rows, reach=R))
        min_id = 2 * rows
        got_m = np.asarray(fft4_hist(frames, a_, b_, floor, min_id, n=n,
                                     hop=hop, sr=sr, rows=rows, reach=R))
    scale = max(want.max(), 1e-30)
    assert np.abs(got - want).max() / scale < 3e-5      # 2-pass bf16 class
    want_m = want.copy()
    want_m[:, :min_id] = 0.0
    assert np.abs(got_m - want_m).max() / scale < 3e-5
    assert np.abs(got_m[:, :min_id]).max() == 0.0
