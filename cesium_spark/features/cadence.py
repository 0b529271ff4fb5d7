"""Cadence (time-sampling) features: numpy kernels over the per-series
time axis ``t`` (and error axis ``e``).

Semantics match the reference implementations in
/root/reference/cesium/features/cadence_features.py (delta-t histogram via
self-convolution, peak finder tie rules, percentileofscore 'rank'
semantics) — re-derived here with no scipy dependency. Note that the
reference's ``peak_ratio(peaks, 1, 2)`` / ``peak_bin(peaks, 1)`` index the
peak list 0-based, so "peak_1_to_2" compares the 2nd and 3rd largest peaks;
we reproduce that behavior exactly (it is what the golden vectors encode).

Time is dimensionless float64; in the astronomy golden data it is days, and
``cad_prob`` thresholds are given in minutes (converted via /(24*60)). The
transcript engine therefore feeds t in days (seconds/86400) so the
cad_probs_<k> thresholds keep their "within k minutes" meaning.
"""

from __future__ import annotations

import numpy as np

from .stats import percentileofscore_rank

__all__ = [
    "step_ratios",
    "cadence_prob",
    "pairwise_dt_hist",
    "normalized_hist",
    "sorted_local_maxima",
    "nth_peak_ratio",
    "nth_peak_bin",
]

MINUTES_PER_DAY = 24.0 * 60.0


def step_ratios(cads: np.ndarray) -> np.ndarray:
    """Double-to-single-step ratios over the cadence array.

    Reproduces the reference code exactly (cadence_features.py:16-19):
    ``(cads[2:] + cads[:-2]) / (cads[1:-1] - cads[:-2])`` — note this is the
    *code's* formula, which differs from its docstring; the golden vectors
    encode the code.
    """
    cads = np.asarray(cads, dtype=np.float64)
    return (cads[2:] + cads[:-2]) / (cads[1:-1] - cads[:-2])


def cadence_prob(cads: np.ndarray, minutes: float) -> float:
    """P(next observation within `minutes` of an arbitrary epoch), computed
    as the rank-percentile of `minutes` (converted to days) within the
    observed cadence distribution."""
    return percentileofscore_rank(cads, float(minutes) / MINUTES_PER_DAY) / 100.0


def pairwise_dt_hist(t: np.ndarray, nbins: int = 50, oversample: int = 50) -> np.ndarray:
    """Histogram (nbins) of all pairwise ``|t_i - t_j|`` values, O(n·b).

    Rather than materializing the O(n^2) differences, histogram t on an
    oversampled grid and self-convolve the counts (the distribution of a
    difference is the cross-correlation of the distribution with itself),
    then fold oversampled bins back down. The i==j self-pairs inflate the
    zero-lag bin by exactly len(t); subtract them. Same algorithm as the
    reference (cadence_features.py:29-41) for bit-equality.
    """
    t = np.asarray(t, dtype=np.float64)
    counts, _edges = np.histogram(t, bins=oversample * nbins)
    corr = np.convolve(counts, counts[::-1])[len(counts) - 1 :]
    corr[0] -= len(t)
    return corr.reshape((nbins, oversample)).sum(axis=1)


def normalized_hist(hist: np.ndarray, total_time: float) -> np.ndarray:
    """Scale so the histogram integrates to 1 over [t_min, t_max]."""
    return hist / (total_time * np.mean(hist))


def sorted_local_maxima(x: np.ndarray) -> list:
    """Local maxima of `x` as ``[(index, value), ...]`` sorted by value
    descending (stable: ties keep ascending index order).

    Tie rule (matches the reference scan in cadence_features.py:51-75): a
    run of equal values is a single candidate peak anchored at its first
    index; the run is a peak iff it rises from the left (or starts the
    array) and falls to the right (or ends the array).
    """
    x = np.asarray(x)
    n = len(x)
    peak_inds = []
    s = 0
    while s < n:
        e = s
        while e + 1 < n and x[e + 1] == x[s]:
            e += 1
        rises_left = s == 0 or x[s] > x[s - 1]
        falls_right = e == n - 1 or x[e + 1] < x[s]
        if rises_left and falls_right:
            peak_inds.append(s)
        s = e + 1
    peak_inds.sort(key=lambda i: x[i], reverse=True)  # Python sort is stable
    return [(i, x[i]) for i in peak_inds]


def nth_peak_ratio(peaks: list, i: int, j: int) -> float:
    """Ratio of the values of peaks[i] and peaks[j] (0-based positions in
    the descending-sorted peak list); nan when either is absent."""
    if len(peaks) > i and len(peaks) > j:
        return peaks[i][1] / peaks[j][1]
    return float("nan")


def nth_peak_bin(peaks: list, i: int) -> float:
    """Bin index of peaks[i] (0-based position); nan when absent."""
    if len(peaks) > i:
        return float(peaks[i][0])
    return float("nan")
