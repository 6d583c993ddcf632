"""Reassignment tests (config 1): parity vs the float64 oracle plus the
property tests of SURVEY.md §4.3 — analytic ground truth is stronger than
oracle-vs-impl."""

import numpy as np
import jax.numpy as jnp
import pytest

from emspec.dsp.reassign import (
    reassigned_spectrogram, reassignment_corrections,
)
from emspec.dsp.stft import stft_triple
from emspec.io import synth

import oracle

SR = 48_000


def test_corrections_parity():
    x = synth.multitone([300.0, 2500.0], 0.15) + synth.noise(0.15, seed=2, amplitude=0.01)
    n, hop = 1024, 256
    want_p, want_dt, want_dw = oracle.corrections(x, n, hop)
    X = stft_triple(jnp.asarray(x), n, hop)
    got_p, got_dt, got_dw = (np.asarray(a) for a in reassignment_corrections(*X))
    scale = want_p.max()
    np.testing.assert_allclose(got_p / scale, want_p / scale, atol=2e-5)
    # corrections are only meaningful where there is energy
    mask = want_p > 1e-6 * scale
    np.testing.assert_allclose(got_dt[mask], want_dt[mask], atol=0.05 * n)
    strong = want_p > 1e-3 * scale
    np.testing.assert_allclose(got_dt[strong], want_dt[strong], atol=0.5)
    np.testing.assert_allclose(got_dw[strong], want_dw[strong], atol=1e-3)


@pytest.mark.parametrize("n,hop", [(512, 128), (2048, 512)])
def test_reassigned_parity_vs_oracle(n, hop):
    x = synth.multitone([440.0, 3000.0], 0.12)
    want = oracle.reassigned_spectrogram(x, n, hop)
    got = np.asarray(reassigned_spectrogram(jnp.asarray(x), n, hop))
    assert got.shape == want.shape
    scale = want.max()
    # quantized scatter: a float32-vs-float64 rounding flip moves a whole
    # bin's energy to a neighbor, so compare totals tightly and cellwise
    # through a 1-bin tolerance blur.
    assert got.sum() == pytest.approx(want.sum(), rel=1e-4)
    diff = np.abs(got - want) / scale
    bad = diff > 5e-3
    if bad.any():
        # every disagreement must be explained by a neighboring-cell swap
        from scipy.ndimage import maximum_filter
        blur_w = maximum_filter(want, size=3)
        blur_g = maximum_filter(got, size=3)
        np.testing.assert_allclose(blur_g / scale, blur_w / scale, atol=2e-2)


def test_pure_tone_reassigns_to_true_frequency():
    """A tone at an off-bin frequency must land within bin/50 of truth
    (SURVEY.md §4.3)."""
    n, hop = 2048, 512
    bin_hz = SR / n
    f_true = 1000.25 * bin_hz   # quarter-bin offset
    x = synth.tone(f_true, 0.2, SR)
    X = stft_triple(jnp.asarray(x), n, hop)
    p, dt, dw = (np.asarray(a) for a in reassignment_corrections(*X))
    t = p.shape[0] // 2
    k = int(p[t].argmax())
    f_hat = (k + dw[t, k] * n / (2 * np.pi)) * bin_hz
    assert abs(f_hat - f_true) < bin_hz / 50


def test_chirp_ridge_tracks_instantaneous_frequency():
    n, hop = 2048, 256
    f0, f1, secs = 500.0, 5000.0, 0.5
    x = synth.chirp(f0, f1, secs, SR)
    S = np.asarray(reassigned_spectrogram(jnp.asarray(x), n, hop))
    bin_hz = SR / n
    t_count = S.shape[0]
    errs = []
    for t in range(t_count // 4, 3 * t_count // 4, 4):
        center_sample = t * hop + n // 2
        f_inst = f0 + (f1 - f0) * (center_sample / SR) / secs
        f_peak = S[t].argmax() * bin_hz
        errs.append(abs(f_peak - f_inst))
    assert np.median(errs) < bin_hz  # ridge follows instantaneous frequency


def test_crossing_chirps_stay_resolved():
    """Two crossing chirps (one rising, one falling) must remain two
    distinct reassigned ridges away from the crossing — multi-component
    separation is reassignment's headline claim (the single-component
    tone/chirp tests never exercise interference between components)."""
    n, hop = 2048, 256
    secs = 0.5
    up = synth.chirp(500.0, 5000.0, secs, SR)
    down = synth.chirp(5000.0, 500.0, secs, SR)
    S = np.asarray(reassigned_spectrogram(jnp.asarray(up + down), n, hop))
    bin_hz = SR / n
    t_count = S.shape[0]
    errs = []
    for t in range(t_count // 8, t_count // 4, 2):   # well before crossing
        center_sample = t * hop + n // 2
        frac = (center_sample / SR) / secs
        f_up = 500.0 + (5000.0 - 500.0) * frac
        f_dn = 5000.0 + (500.0 - 5000.0) * frac
        col = S[t]
        # each component's ridge peaks within its own half of the band
        k_split = int(((f_up + f_dn) / 2) / bin_hz)
        k_lo = int(col[:k_split].argmax())
        k_hi = k_split + int(col[k_split:].argmax())
        lo_true, hi_true = sorted((f_up, f_dn))
        errs.append(abs(k_lo * bin_hz - lo_true))
        errs.append(abs(k_hi * bin_hz - hi_true))
    assert np.median(errs) < 2 * bin_hz


def test_impulse_reassigns_in_time():
    """An impulse must reassign in *time* to the impulse instant."""
    n, hop = 1024, 128
    num = 8 * n
    at = 3 * n + 200
    x = synth.impulse(at, num)
    S = np.asarray(reassigned_spectrogram(jnp.asarray(x), n, hop))
    # total per-column energy must concentrate at the column whose frame
    # center is nearest the impulse
    col_energy = S.sum(axis=1)
    t_expect = round((at - n // 2) / hop)
    t_got = int(col_energy.argmax())
    assert abs(t_got - t_expect) <= 1
    # and that column must hold nearly everything
    assert col_energy[t_got] > 0.95 * col_energy.sum()


def test_energy_conserved_through_scatter():
    """Parseval-style: scatter only moves energy, never creates it; with a
    permissive floor and in-range targets, totals match the plain STFT."""
    n, hop = 1024, 256
    x = synth.multitone([400.0, 1200.0, 4000.0], 0.2)
    X_h, _, _ = stft_triple(jnp.asarray(x), n, hop)
    plain_total = float(np.sum(np.abs(np.asarray(X_h)) ** 2))
    S = np.asarray(reassigned_spectrogram(jnp.asarray(x), n, hop))
    assert S.sum() <= plain_total * (1 + 1e-5)
    assert S.sum() > 0.9 * plain_total  # tones: most energy stays in range


def test_silence_gives_zero():
    x = synth.silence(0.1, SR)
    S = np.asarray(reassigned_spectrogram(jnp.asarray(x), 512, 128))
    assert S.sum() == 0.0


@pytest.mark.slow
def test_multichannel_vmap_consistency():
    x0 = synth.tone(440.0, 0.1, SR)
    x1 = synth.tone(2000.0, 0.1, SR)
    both = np.asarray(
        reassigned_spectrogram(jnp.asarray(np.stack([x0, x1])), 512, 128))
    single0 = np.asarray(reassigned_spectrogram(jnp.asarray(x0), 512, 128))
    np.testing.assert_allclose(both[0], single0, atol=0)
