"""Self-contained numpy replacements for the scipy.stats routines the
reference feature set depends on.

scipy is not available in this environment, so each function here
re-derives the statistic from its published definition and is validated
against the reference's golden vectors (tests/data/expected_features.csv,
produced by cesium via scipy) and its hard-coded regression constants.

Reference usage sites (for parity auditing):
  - skew/kurtosis:        /root/reference/cesium/features/common_functions.py:43-50
  - percentileofscore:    /root/reference/cesium/features/cadence_features.py:22-26
  - anderson (A^2):       /root/reference/cesium/features/common_functions.py:82-84
  - shapiro (W):          /root/reference/cesium/features/common_functions.py:87-89
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "moment_skew",
    "moment_kurtosis",
    "percentileofscore_rank",
    "norm_ppf",
    "norm_logcdf",
    "anderson_darling_stat",
    "shapiro_wilk_stat",
]


def moment_skew(x: np.ndarray) -> float:
    """Biased sample skewness g1 = m3 / m2^1.5 (scipy.stats.skew defaults:
    bias=True). Returns nan for n == 0; 0/0 -> nan like scipy."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return float("nan")
    mu = x.mean()
    d = x - mu
    m2 = np.mean(d * d)
    m3 = np.mean(d * d * d)
    if m2 == 0.0:
        return float("nan") if m3 == 0.0 else math.copysign(float("inf"), m3)
    return float(m3 / m2**1.5)


def moment_kurtosis(x: np.ndarray) -> float:
    """Excess kurtosis g2 = m4 / m2^2 - 3 (scipy.stats.kurtosis defaults:
    Fisher=True, bias=True)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return float("nan")
    mu = x.mean()
    d = x - mu
    m2 = np.mean(d * d)
    m4 = np.mean(d * d * d * d)
    if m2 == 0.0:
        return float("nan")
    return float(m4 / (m2 * m2) - 3.0)


def percentileofscore_rank(a: np.ndarray, score: float) -> float:
    """scipy.stats.percentileofscore(a, score, kind='rank') in [0, 100].

    rank semantics: with left = #(a < score) and right = #(a <= score),
    pct = (left + right + (1 if right > left else 0)) * 50 / n.
    """
    a = np.asarray(a, dtype=np.float64)
    n = a.size
    if n == 0:
        return float("nan")
    left = int(np.count_nonzero(a < score))
    right = int(np.count_nonzero(a <= score))
    return (left + right + (1 if right > left else 0)) * 50.0 / n


# --- normal distribution helpers -------------------------------------------

# Wichura's algorithm AS 241 (PPND16): inverse normal CDF to ~1e-16.
_P_LOW = 0.02425  # not used by AS241; kept out — AS241 uses split at 0.425/5.0


def norm_ppf(p):
    """Inverse standard normal CDF, algorithm AS 241 (PPND16), vectorized."""
    p = np.asarray(p, dtype=np.float64)
    q = p - 0.5
    out = np.empty_like(p)

    central = np.abs(q) <= 0.425
    if np.any(central):
        r = 0.180625 - q[central] * q[central]
        num = (
            (
                (
                    (
                        (
                            (
                                (2.5090809287301226727e3 * r + 3.3430575583588128105e4)
                                * r
                                + 6.7265770927008700853e4
                            )
                            * r
                            + 4.5921953931549871457e4
                        )
                        * r
                        + 1.3731693765509461125e4
                    )
                    * r
                    + 1.9715909503065514427e3
                )
                * r
                + 1.3314166789178437745e2
            )
            * r
            + 3.3871328727963666080e0
        )
        den = (
            (
                (
                    (
                        (
                            (
                                (5.2264952788528545610e3 * r + 2.8729085735721942674e4)
                                * r
                                + 3.9307895800092710610e4
                            )
                            * r
                            + 2.1213794301586595867e4
                        )
                        * r
                        + 5.3941960214247511077e3
                    )
                    * r
                    + 6.8718700749205790830e2
                )
                * r
                + 4.2313330701600911252e1
            )
            * r
            + 1.0
        )
        out[central] = q[central] * num / den

    tails = ~central
    if np.any(tails):
        qt = q[tails]
        pt = p[tails]
        r = np.where(qt < 0, pt, 1.0 - pt)
        r = np.sqrt(-np.log(r))
        out_t = np.empty_like(r)
        mid = r <= 5.0
        if np.any(mid):
            rr = r[mid] - 1.6
            num = (
                (
                    (
                        (
                            (
                                (
                                    (7.74545014278341407640e-4 * rr + 2.27238449892691845833e-2)
                                    * rr
                                    + 2.41780725177450611770e-1
                                )
                                * rr
                                + 1.27045825245236838258e0
                            )
                            * rr
                            + 3.64784832476320460504e0
                        )
                        * rr
                        + 5.76949722146069140550e0
                    )
                    * rr
                    + 4.63033784615654529590e0
                )
                * rr
                + 1.42343711074968357734e0
            )
            den = (
                (
                    (
                        (
                            (
                                (
                                    (1.05075007164441684324e-9 * rr + 5.47593808499534494600e-4)
                                    * rr
                                    + 1.51986665636164571966e-2
                                )
                                * rr
                                + 1.48103976427480074590e-1
                            )
                            * rr
                            + 6.89767334985100004550e-1
                        )
                        * rr
                        + 1.67638483018380384940e0
                    )
                    * rr
                    + 2.05319162663775882187e0
                )
                * rr
                + 1.0
            )
            out_t[mid] = num / den
        far = ~mid
        if np.any(far):
            rr = r[far] - 5.0
            num = (
                (
                    (
                        (
                            (
                                (
                                    (2.01033439929228813265e-7 * rr + 2.71155556874348757815e-5)
                                    * rr
                                    + 1.24266094738807843860e-3
                                )
                                * rr
                                + 2.65321895265761230930e-2
                            )
                            * rr
                            + 2.96560571828504891230e-1
                        )
                        * rr
                        + 1.78482653991729133580e0
                    )
                    * rr
                    + 5.46378491116411436990e0
                )
                * rr
                + 6.65790464350110377720e0
            )
            den = (
                (
                    (
                        (
                            (
                                (
                                    (2.04426310338993978564e-15 * rr + 1.42151175831644588870e-7)
                                    * rr
                                    + 1.84631831751005468180e-5
                                )
                                * rr
                                + 7.86869131145613259100e-4
                            )
                            * rr
                            + 1.48753612908506148525e-2
                        )
                        * rr
                        + 1.36929880922735805310e-1
                    )
                    * rr
                    + 5.99832206555887937690e-1
                )
                * rr
                + 1.0
            )
            out_t[far] = num / den
        out_t = np.where(qt < 0, -out_t, out_t)
        out[tails] = out_t
    return out if out.ndim else float(out)


_SQRT2 = math.sqrt(2.0)
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
_erfc_vec = np.frompyfunc(math.erfc, 1, 1)


def norm_logcdf(z):
    """log(Phi(z)), accurate into the lower tail.

    Uses log(0.5*erfc(-z/sqrt(2))) where erfc doesn't underflow, and the
    asymptotic expansion  log Phi(z) ~ -z^2/2 - log(-z) - log sqrt(2 pi)
    + log1p(-1/z^2 + 3/z^4)  for z << 0.
    """
    z = np.asarray(z, dtype=np.float64)
    out = np.empty_like(z)
    safe = z > -36.0
    if np.any(safe):
        zs = z[safe]
        out[safe] = np.log(0.5 * _erfc_vec(-zs / _SQRT2).astype(np.float64))
    deep = ~safe
    if np.any(deep):
        zd = z[deep]
        z2 = zd * zd
        out[deep] = (
            -0.5 * z2 - np.log(-zd) - _LOG_SQRT_2PI + np.log1p(-1.0 / z2 + 3.0 / (z2 * z2))
        )
    return out if out.ndim else float(out)


def anderson_darling_stat(x: np.ndarray) -> float:
    """Anderson-Darling A^2 statistic against the normal distribution with
    estimated mean/std, matching scipy.stats.anderson(x, 'norm')[0]:
    standardize by mean and std(ddof=1), then
      A^2 = -n - mean( (2i-1) * (logPhi(z_i) + log(1-Phi(z_{n+1-i}))) ).
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 2:
        return float("nan")
    mu = x.mean()
    s = x.std(ddof=1)
    z = (x - mu) / s
    logcdf = norm_logcdf(z)
    logsf = norm_logcdf(-z)  # symmetry: log(1 - Phi(z)) = log(Phi(-z))
    i = np.arange(1, n + 1, dtype=np.float64)
    return float(-n - np.sum((2.0 * i - 1.0) / n * (logcdf + logsf[::-1])))


def shapiro_wilk_stat(x: np.ndarray) -> float:
    """Shapiro-Wilk W statistic per Royston's AS R94 approximation
    (Applied Statistics 44(4), 1995), matching scipy.stats.shapiro(x)[0].

    Only the W statistic is computed (the reference uses [0] only).
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 3:
        return float("nan")
    if n == 3:
        a = np.array([math.sqrt(0.5), 0.0, -math.sqrt(0.5)])
    else:
        i = np.arange(1, n + 1, dtype=np.float64)
        m = norm_ppf((i - 0.375) / (n + 0.25))
        ssq_m = float(np.sum(m * m))
        u = 1.0 / math.sqrt(n)
        # Royston's polynomial corrections for the extreme weights.
        a_n = (
            m[-1] / math.sqrt(ssq_m)
            + u * (0.221157 + u * (-0.147981 + u * (-2.071190 + u * (4.434685 + u * -2.706056))))
        )
        if n > 5:
            a_n1 = (
                m[-2] / math.sqrt(ssq_m)
                + u
                * (0.042981 + u * (-0.293762 + u * (-1.752461 + u * (5.682633 + u * -3.582633))))
            )
            phi = (ssq_m - 2.0 * m[-1] ** 2 - 2.0 * m[-2] ** 2) / (
                1.0 - 2.0 * a_n**2 - 2.0 * a_n1**2
            )
            a = np.empty(n)
            a[2:-2] = m[2:-2] / math.sqrt(phi)
            a[-1] = a_n
            a[-2] = a_n1
            a[0] = -a_n
            a[1] = -a_n1
        else:
            phi = (ssq_m - 2.0 * m[-1] ** 2) / (1.0 - 2.0 * a_n**2)
            a = np.empty(n)
            a[1:-1] = m[1:-1] / math.sqrt(phi)
            a[-1] = a_n
            a[0] = -a_n
    num = float(np.dot(a, x)) ** 2
    den = float(np.sum((x - x.mean()) ** 2))
    if den == 0.0:
        return float("nan")
    return num / den
