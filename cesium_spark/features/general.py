"""General (value-axis) features: numpy kernels over per-series measurement
array ``m`` and error array ``e``.

Numerical semantics match the reference
(/root/reference/cesium/features/common_functions.py,
amplitude.py, stetson.py), validated against its golden vectors; all
implementations here are scipy-free.
"""

from __future__ import annotations

import numpy as np

from .stats import anderson_darling_stat, shapiro_wilk_stat

__all__ = [
    "amplitude",
    "percent_amplitude",
    "percent_difference_flux_percentile",
    "flux_percentile_ratio",
    "max_slope",
    "median_absolute_deviation",
    "percent_beyond_1_std",
    "percent_close_to_median",
    "weighted_average",
    "weighted_std_dev",
    "anderson_darling",
    "shapiro_wilk",
    "stetson_mean",
    "stetson_j",
    "stetson_k",
]

# Magnitude->flux linearization used by the percentile features: the data is
# assumed log-scaled as x = -2.5*log10(flux), i.e. flux = 10^(-0.4 x).
_FLUX_BASE = 10.0
_FLUX_EXP = -0.4


def amplitude(m: np.ndarray) -> float:
    """Half the max-min range of the values."""
    return (np.max(m) - np.min(m)) / 2.0


def _linear_flux(m: np.ndarray) -> np.ndarray:
    return _FLUX_BASE ** (_FLUX_EXP * np.asarray(m, dtype=np.float64))


def percent_amplitude(m: np.ndarray) -> float:
    """Largest deviation from the median of the linearized flux, as a
    fraction of that median."""
    f = _linear_flux(m)
    fmed = np.median(f)
    return max(abs((np.max(f) - fmed) / fmed), abs((fmed - np.min(f)) / fmed))


def percent_difference_flux_percentile(m: np.ndarray) -> float:
    """(P95 - P5) / P50 of the linearized flux."""
    f = _linear_flux(m)
    p95, p50, p5 = np.percentile(f, [95, 50, 5])
    return (p95 - p5) / p50


def flux_percentile_ratio(m: np.ndarray, percentile_range: float) -> float:
    """((50+r/2)th - (50-r/2)th percentile) / (95th - 5th percentile) of the
    linearized flux."""
    f = _linear_flux(m)
    half = percentile_range / 2.0
    hi, lo, p95, p5 = np.percentile(f, [50 + half, 50 - half, 95, 5])
    return (hi - lo) / (p95 - p5)


def max_slope(t: np.ndarray, m: np.ndarray) -> float:
    """Largest |dm/dt| between consecutive points (time-sorted input)."""
    return np.max(np.abs(np.diff(m) / np.diff(t)))


def median_absolute_deviation(m: np.ndarray) -> float:
    return np.median(np.abs(m - np.median(m)))


def weighted_average(m: np.ndarray, e: np.ndarray) -> float:
    """Mean of m weighted by inverse squared error."""
    w = 1.0 / (np.asarray(e, dtype=np.float64) ** 2)
    return np.average(m, weights=w)


def weighted_std_dev(m: np.ndarray, e: np.ndarray) -> float:
    """sqrt of the inverse-variance-weighted dispersion about the weighted
    mean (normalized by sum of weights, i.e. 'population' form)."""
    w = 1.0 / (np.asarray(e, dtype=np.float64) ** 2)
    mu = np.average(m, weights=w)
    return np.sqrt(np.average((m - mu) ** 2, weights=w))


def percent_beyond_1_std(m: np.ndarray, e: np.ndarray) -> float:
    """Fraction of values more than one weighted std dev from the weighted
    mean."""
    dev = m - weighted_average(m, e)
    return np.mean(np.abs(dev) > weighted_std_dev(m, e))


def percent_close_to_median(m: np.ndarray, window_frac: float = 0.1) -> float:
    """Fraction of values within window_frac*(max-min) of the median."""
    window = (np.max(m) - np.min(m)) * window_frac
    return np.mean(np.abs(m - np.median(m)) < window)


def anderson_darling(m: np.ndarray, e: np.ndarray) -> float:
    """A^2 normality statistic of the error-scaled values m/e."""
    return anderson_darling_stat(np.asarray(m, dtype=np.float64) / e)


def shapiro_wilk(m: np.ndarray, e: np.ndarray) -> float:
    """Shapiro-Wilk W statistic of the error-scaled values m/e."""
    return shapiro_wilk_stat(np.asarray(m, dtype=np.float64) / e)


def stetson_mean(
    x: np.ndarray,
    weight: float = 100.0,
    alpha: float = 2.0,
    beta: float = 2.0,
    tol: float = 1.0e-6,
    nmax: int = 20,
) -> float:
    """Iteratively reweighted robust mean used by the Stetson indices.

    Starts from the median and downweights points by their scaled residual
    until the update is below tol (absolute or relative), max nmax rounds.
    Iteration count is data-dependent — this must run per-series inside the
    vectorized kernel, never as a SQL expression.
    """
    mu = np.median(x)
    for _ in range(nmax):
        resid = x - mu
        resid_err = np.abs(resid) * np.sqrt(weight)
        w = weight / (1.0 + (resid_err / alpha) ** beta)
        w /= w.mean()
        diff = np.mean(x * w) - mu
        mu += diff
        if np.abs(diff) < tol * np.abs(mu) or np.abs(diff) < tol:
            break
    return mu


def stetson_j(x: np.ndarray, dx: float = 0.1) -> float:
    """Stetson's robust variance index: mean(sign(p)*sqrt|p|) with
    p = delta^2 - 1 and delta the bias-corrected, error-scaled residual from
    the Stetson mean. The reference hardcodes dx=0.1 and ignores the actual
    per-point errors; we keep that."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    x0 = stetson_mean(x, 1.0 / dx**2)
    delta = np.sqrt(n / (n - 1.0)) * (x - x0) / dx
    p = delta**2 - 1.0
    return np.mean(np.sign(p) * np.sqrt(np.abs(p)))


def stetson_k(x: np.ndarray, dx: float = 0.1) -> float:
    """Stetson's robust kurtosis: (1/0.798) * mean|delta| / sqrt(mean delta^2)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    x0 = stetson_mean(x, 1.0 / dx**2)
    delta = np.sqrt(n / (n - 1.0)) * (x - x0) / dx
    return 1.0 / 0.798 * np.mean(np.abs(delta)) / np.sqrt(np.mean(delta**2))
