"""CWT ridge-line peak detection (A11): numpy reimplementation of the
published find_peaks_cwt algorithm — golden counts on synthetic
chromatographic profiles."""

from __future__ import annotations

import numpy as np
import pytest

from candia_spark.functions.cwt import (
    count_peaks_cwt,
    cwt_matrix,
    find_peaks_cwt,
    ricker,
)


def gaussians(n, centers, width=4.0, amps=None):
    x = np.arange(n, dtype=float)
    y = np.zeros(n)
    for i, c in enumerate(centers):
        a = 1.0 if amps is None else amps[i]
        y += a * np.exp(-((x - c) ** 2) / (2 * width**2))
    return y


def test_ricker_properties():
    w = ricker(101, 4.0)
    assert w.shape == (101,)
    assert np.argmax(w) == 50  # peak at center
    assert w[50] > 0
    np.testing.assert_allclose(w, w[::-1])  # symmetric
    assert abs(w.sum()) < 1e-8  # zero mean (admissibility)


def test_cwt_matrix_shape():
    sig = gaussians(100, [50])
    m = cwt_matrix(sig, np.array([1.0, 2.0, 4.0]))
    assert m.shape == (3, 100)
    # response at the true peak grows toward the matched scale
    assert m[2, 50] > m[0, 50] > 0


@pytest.mark.parametrize(
    "centers",
    [[50], [30, 70], [20, 50, 80]],
)
def test_find_peaks_clean_signals(centers):
    sig = gaussians(100, centers)
    locs = find_peaks_cwt(sig, np.arange(1, 10))
    assert len(locs) == len(centers)
    for c in centers:
        assert min(abs(locs - c)) <= 3


def test_find_peaks_noise_robust():
    rng = np.random.default_rng(7)
    sig = gaussians(120, [30, 85], width=5.0) + rng.normal(0, 0.02, 120)
    locs = find_peaks_cwt(sig, np.arange(1, 12))
    assert len(locs) == 2


def test_count_peaks_cwt_reference_recipe():
    # expected width from the reference config ratio: T * (fwhm / window)
    sig = gaussians(60, [15, 45], width=3.0)
    assert count_peaks_cwt(sig, expected_peak_width=60 * 0.2) == 2
    one = gaussians(60, [30], width=3.0)
    assert count_peaks_cwt(one, expected_peak_width=60 * 0.2) == 1
    # low-value clip removes background ripple below 10% of max
    ripple = one + 0.05 * np.sin(np.arange(60))
    assert count_peaks_cwt(ripple, expected_peak_width=60 * 0.2) == 1


def test_count_peaks_cwt_degenerate():
    assert count_peaks_cwt(np.zeros(30), 5.0) == 0
    assert count_peaks_cwt(np.array([]), 5.0) == 0
    assert count_peaks_cwt(np.full(30, np.nan), 5.0) == 0
    # tiny expected width still yields a usable widths range
    assert count_peaks_cwt(gaussians(20, [10], 2.0), 0.4) >= 1
