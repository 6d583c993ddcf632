"""Window unit tests (SURVEY.md §4.5: symmetry/COLA, analytic derivative)."""

import numpy as np
import pytest

from emspec.dsp import windows as W

import oracle


@pytest.mark.parametrize("n", [512, 2048, 4096])
def test_matches_oracle(n):
    h, th, dh = oracle.windows(n)
    np.testing.assert_allclose(W.hann(n, np.float64), h, rtol=0, atol=0)
    np.testing.assert_allclose(W.time_weighted_hann(n, np.float64), th, rtol=0, atol=0)
    np.testing.assert_allclose(W.hann_derivative(n, np.float64), dh, rtol=0, atol=0)


def test_hann_endpoints_and_peak():
    h = W.hann(1024, np.float64)
    assert h[0] == 0.0
    assert h[512] == pytest.approx(1.0)  # periodic Hann peaks at n/2


def test_hann_cola_75_percent_overlap():
    """Periodic Hann with hop = n/4 satisfies constant overlap-add (sum = 2)."""
    n, hop = 1024, 256
    h = W.hann(n, np.float64)
    acc = np.zeros(4 * n)
    for start in range(0, 3 * n, hop):
        acc[start:start + n] += h
    mid = acc[n: 2 * n]
    np.testing.assert_allclose(mid, 2.0, atol=1e-12)


def test_time_ramp_is_centered():
    """Energy-weighted mean of th/h must be ~0 (centered ramp)."""
    n = 2048
    h = W.hann(n, np.float64)
    th = W.time_weighted_hann(n, np.float64)
    assert abs(np.sum(th * h) / np.sum(h * h)) < 1e-9


def test_derivative_matches_finite_difference():
    """Analytic dh/dn vs high-order central finite difference of h."""
    n = 4096
    idx = np.arange(-2, n + 2)
    h_ext = 0.5 - 0.5 * np.cos(2 * np.pi * idx / n)  # periodic extension
    fd = (-h_ext[4:] + 8 * h_ext[3:-1] - 8 * h_ext[1:-3] + h_ext[:-4]) / 12.0
    np.testing.assert_allclose(W.hann_derivative(n, np.float64), fd, atol=1e-10)


def test_window_triple_layout():
    w3 = W.window_triple(2048)
    assert w3.shape == (3, 2048)
    assert w3.dtype == np.float32
    np.testing.assert_array_equal(w3[0], W.hann(2048))
