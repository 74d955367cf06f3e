"""Continuous-wavelet-transform peak detection (SURVEY §2.4 A11) in pure
numpy — the ridge-line method of Du, Kibbe & Lin (Bioinformatics 2006),
the published algorithm behind ``scipy.signal.find_peaks_cwt`` (scipy is
not available in this environment; this is a reimplementation from the
algorithm description, not a copy).

Parity target: the reference counts chromatographic peaks per time-mode
component with ``find_peaks_cwt(clipped, widths=np.arange(1, 2 * expected))``
after zeroing values <= 10% of max (scripts/parafac/
collect_time_mode_values.py:78-87). Defaults below mirror the documented
scipy defaults: gap threshold = ceil(widths[0]), max ridge-gap distance =
width / 4, min ridge length = ceil(n_widths / 4), SNR >= 1 against the
10th percentile of |smallest-scale CWT| in a window of n_points / 20.

This runs inside grouped-map kernels over short per-component series (tens
to hundreds of points), so plain numpy convolution is the right tool — no
Spark expressions needed at this depth.
"""

from __future__ import annotations

from math import ceil

import numpy as np


def ricker(points: int, a: float) -> np.ndarray:
    """Ricker (Mexican-hat) wavelet, unit-normalized as in the standard
    formulation: psi(t) = 2/(sqrt(3a) pi^(1/4)) (1 - t^2/a^2) e^(-t^2/2a^2)."""
    amp = 2.0 / (np.sqrt(3.0 * a) * np.pi**0.25)
    t = np.arange(points) - (points - 1.0) / 2.0
    tsq = t**2
    return amp * (1.0 - tsq / a**2) * np.exp(-tsq / (2.0 * a**2))


def cwt_matrix(signal: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Rows = same-length convolution of the signal with a ricker wavelet
    per width (wavelet support capped at min(10*width, len(signal)))."""
    signal = np.asarray(signal, dtype=np.float64)
    out = np.empty((len(widths), signal.size))
    for i, w in enumerate(widths):
        # support forced odd (shrinking, never exceeding the signal): an
        # even-length symmetric wavelet is centered between samples, so
        # convolving a symmetric peak yields an exact two-point plateau
        # that relative-maxima detection would mislocate
        points = min(int(10 * w), signal.size)
        if points % 2 == 0:
            points -= 1
        wav = ricker(max(points, 1), w)
        out[i] = np.convolve(signal, wav, mode="same")
    return out


def _relative_maxima(row: np.ndarray) -> np.ndarray:
    """Indices of relative maxima, plateau-tolerant: a rise followed
    (through any run of equal values) by a fall marks the plateau's first
    point. Exact float ties occur systematically on symmetric inputs."""
    if row.size < 3:
        return np.empty(0, dtype=int)
    idx = []
    last_rise = None
    d = np.diff(row)
    for i, v in enumerate(d):
        if v > 0:
            last_rise = i + 1
        elif v < 0:
            if last_rise is not None:
                idx.append(last_rise)
            last_rise = None
    return np.asarray(idx, dtype=int)


def identify_ridge_lines(
    matr: np.ndarray, max_distances: np.ndarray, gap_thresh: float
) -> list[tuple[list[int], list[int]]]:
    """Connect per-scale relative maxima into ridge lines, walking from the
    largest scale down. A line adopts the nearest new maximum within
    ``max_distances[row]`` columns; lines unmatched for more than
    ``gap_thresh`` consecutive scales are closed. Returns (rows, cols)
    per line, last-appended point first at the smallest scale end."""
    maxima_per_row = [_relative_maxima(matr[r]) for r in range(matr.shape[0])]
    rows_with_max = [r for r, m in enumerate(maxima_per_row) if m.size]
    if not rows_with_max:
        return []
    start = rows_with_max[-1]
    # line state: (rows, cols, gap)
    lines: list[list] = [[[start], [int(c)], 0] for c in maxima_per_row[start]]
    closed: list[list] = []
    for row in range(start - 1, -1, -1):
        for ln in lines:
            ln[2] += 1
        for col in maxima_per_row[row]:
            col = int(col)
            best = None
            if lines:
                dists = [abs(col - ln[1][-1]) for ln in lines]
                k = int(np.argmin(dists))
                if dists[k] <= max_distances[row]:
                    best = lines[k]
            if best is not None:
                best[0].append(row)
                best[1].append(col)
                best[2] = 0
            else:
                lines.append([[row], [col], 0])
        still_open = []
        for ln in lines:
            if ln[2] > gap_thresh:
                closed.append(ln)
            else:
                still_open.append(ln)
        lines = still_open
    closed.extend(lines)
    return [(ln[0], ln[1]) for ln in closed]


def filter_ridge_lines(
    matr: np.ndarray,
    lines: list[tuple[list[int], list[int]]],
    min_length: int | None = None,
    window_size: int | None = None,
    min_snr: float = 1.0,
    noise_perc: float = 10.0,
) -> list[tuple[list[int], list[int]]]:
    """Keep ridge lines long enough across scales and with sufficient SNR:
    line strength = |CWT at the line's largest-scale start|; noise = the
    ``noise_perc`` percentile of |smallest-scale CWT| in a window around
    the line's column."""
    n_rows, n_points = matr.shape
    if min_length is None:
        min_length = ceil(n_rows / 4)
    if window_size is None:
        window_size = ceil(n_points / 20)
    window_size = max(int(window_size), 1)
    hf = window_size // 2
    row_zero = np.abs(matr[0])
    kept = []
    for rows, cols in lines:
        if len(rows) < min_length:
            continue
        start = matr[rows[0], cols[0]]
        # robustness deviation from the textbook filter: a ricker response
        # at a genuine peak is POSITIVE; ridges that start on a negative
        # value are inter-peak negative-lobe artifacts and are rejected
        # outright instead of relying on |value| SNR
        if start <= 0:
            continue
        col = cols[0]
        lo = max(col - hf, 0)
        hi = min(col + hf + 1, n_points)
        noise = np.percentile(row_zero[lo:hi], noise_perc)
        if noise == 0 or start / noise >= min_snr:
            kept.append((rows, cols))
    return kept


def find_peaks_cwt(
    signal: np.ndarray,
    widths: np.ndarray,
    gap_thresh: float | None = None,
    min_length: int | None = None,
    min_snr: float = 1.0,
    noise_perc: float = 10.0,
) -> np.ndarray:
    """Peak locations via CWT ridge lines: sorted column indices of each
    surviving line's starting point (the largest scale it was tracked at)."""
    widths = np.asarray(widths, dtype=np.float64)
    if widths.size == 0:
        widths = np.array([1.0])
    if gap_thresh is None:
        gap_thresh = ceil(widths[0])
    max_distances = widths / 4.0
    matr = cwt_matrix(signal, widths)
    lines = identify_ridge_lines(matr, max_distances, gap_thresh)
    kept = filter_ridge_lines(
        matr, lines, min_length=min_length, min_snr=min_snr, noise_perc=noise_perc
    )
    return np.array(sorted(cols[0] for _rows, cols in kept), dtype=int)


def count_peaks_cwt(
    profile: np.ndarray, expected_peak_width: float, clip_frac: float = 0.1
) -> int:
    """The reference's exact counting recipe (collect_time_mode_values.py:
    79-87): zero values <= clip_frac * max, then count CWT peaks with
    widths 1 .. 2*expected_peak_width."""
    x = np.asarray(profile, dtype=np.float64).copy()
    if x.size == 0 or not np.isfinite(x).any() or np.nanmax(x) <= 0:
        return 0
    x[x <= np.nanmax(x) * clip_frac] = 0.0
    widths = np.arange(1, max(expected_peak_width * 2, 2))
    return int(find_peaks_cwt(x, widths).size)
