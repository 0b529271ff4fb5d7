"""Fast single-sinusoid best-period estimate.

The reference delegates to gatspy's LombScargleFast
(/root/reference/cesium/features/lomb_scargle_fast.py): a floating-mean
(generalized) Lomb-Scargle periodogram scanned over period_range
(2*baseline/n, baseline), best period returned.

gatspy is not installable here and its optimizer's exact grid/zoom
internals are not reproducible offline, so this module implements the same
quantity from the published formalism (Zechmeister & Kuerster 2009, A&A
496, 577: generalized LS with floating mean and errors as weights) on a
dense grid (oversample 5 per peak width) with one parabolic refinement at
the peak. It recovers injected periods exactly (tests) but is NOT
bit-identical to gatspy — period_fast is therefore excluded from the
golden-vector comparison (tests/test_golden.py documents this).
"""

from __future__ import annotations

import numpy as np

__all__ = ["period_fast"]


def _gls_power(t, y, w, freqs):
    """Generalized (floating-mean) Lomb-Scargle power at `freqs`.

    Vectorized over the frequency grid: O(n_freq * n) memory-chunked.
    """
    power = np.empty(len(freqs))
    ybar = np.dot(w, y)
    yy = np.dot(w, (y - ybar) ** 2)
    chunk = max(1, int(2_000_000 / max(len(t), 1)))
    for s in range(0, len(freqs), chunk):
        f = freqs[s: s + chunk]
        omega_t = 2.0 * np.pi * np.outer(f, t)  # (nf, n)
        sin_wt = np.sin(omega_t)
        cos_wt = np.cos(omega_t)
        C = cos_wt @ w
        S = sin_wt @ w
        CC = (cos_wt * cos_wt) @ w - C * C
        SS = (sin_wt * sin_wt) @ w - S * S
        CS = (cos_wt * sin_wt) @ w - C * S
        yc = cos_wt @ (w * y) - C * ybar
        ys = sin_wt @ (w * y) - S * ybar
        D = CC * SS - CS * CS
        with np.errstate(divide="ignore", invalid="ignore"):
            p = (SS * yc * yc + CC * ys * ys - 2.0 * CS * yc * ys) / (yy * D)
        power[s: s + chunk] = np.where(D > 0, p, 0.0)
    return power


def period_fast(t, m, e, oversample: int = 5) -> float:
    """Best period of a floating-mean sinusoid fit over the reference's
    period_range = (2*baseline/n, baseline)."""
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    n = len(t)
    baseline = t.max() - t.min()
    if n < 3 or baseline <= 0:
        raise ValueError("period_fast needs >= 3 points spanning > 0 time")
    period_min = 2.0 * baseline / n
    period_max = baseline
    f_min = 1.0 / period_max
    f_max = 1.0 / period_min
    df = 1.0 / (oversample * baseline)
    freqs = np.arange(f_min, f_max + df, df)

    w = 1.0 / e**2
    w = w / w.sum()
    power = _gls_power(t, m, w, freqs)
    j = int(np.argmax(power))

    # parabolic refinement on the 3 points around the peak
    if 0 < j < len(freqs) - 1:
        y0, y1, y2 = power[j - 1], power[j], power[j + 1]
        denom = y0 - 2.0 * y1 + y2
        if denom != 0:
            shift = 0.5 * (y0 - y2) / denom
            shift = float(np.clip(shift, -0.5, 0.5))
            return 1.0 / (freqs[j] + shift * df)
    return 1.0 / freqs[j]
