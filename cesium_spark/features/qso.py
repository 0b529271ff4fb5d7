"""Damped-random-walk (QSO) model fit — scipy-free numpy port of the
reference's Rybicki-Press banded solver pipeline
(/root/reference/cesium/features/qso_model.py; formalism from Rybicki &
Press 1994, arXiv:comp-gas/9405004).

The covariance L_ij = 0.5*var*tau*exp(-|t_i-t_j|/tau) has tridiagonal
inverse T; all solves are banded Cholesky on (2, n) upper-form arrays.
scipy replacements implemented from the published definitions:
  - solveh_banded / cholesky_banded: direct tridiagonal Cholesky,
  - betainc: regularized incomplete beta via Lentz's continued fraction,
  - gammaincc: series / continued-fraction split at x = a+1,
  - gammaln: math.lgamma,
  - norm.ppf: stats.norm_ppf (AS 241).
Validated against the reference's hard-coded regression constants
(test_general_features.py:232-233) and sanity-checked on the golden
series.
"""

from __future__ import annotations

import math

import numpy as np

from .stats import norm_ppf

__all__ = ["qso_fit", "qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu"]


# ------------------------------------------------------- special functions


def _gammaln(x: float) -> float:
    return math.lgamma(x)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = _gammaln(a + b) - _gammaln(a) - _gammaln(b) + a * math.log(x) + b * math.log1p(-x)
    front = math.exp(lbeta)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _gammaincc(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # 1 - lower series
        ap, s, delta = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            s += delta
            if abs(delta) < abs(s) * 3e-16:
                break
        return 1.0 - s * math.exp(-x + a * math.log(x) - _gammaln(a))
    # continued fraction (Lentz)
    FPMIN = 1e-300
    b = x + 1.0 - a
    c = 1.0 / FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < FPMIN:
            d = FPMIN
        c = b + an / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-16:
            break
    return h * math.exp(-x + a * math.log(x) - _gammaln(a))


def _lprob2sigma(lprob: float) -> float:
    """log_e(prob) -> sigmas; the QSO variant (qso_model.py:8-15) omits the
    Newton correction used by the Lomb-Scargle variant."""
    if lprob > -36.0:
        return float(norm_ppf(np.array(1.0 - 0.5 * np.exp(lprob))))
    return float(np.sqrt(np.log(2.0 / np.pi) - 2.0 * np.log(8.2) - 2.0 * lprob))


# --------------------------------------------------------- banded algebra


def _cholesky_banded_tridiag(ab: np.ndarray) -> np.ndarray:
    """Upper-form banded Cholesky of a symmetric tridiagonal matrix.
    ab[1] = diagonal, ab[0, 1:] = superdiagonal; returns t of same shape
    with A = t^T t (t[1] diag of the upper-bidiagonal factor)."""
    n = ab.shape[1]
    t = np.zeros_like(ab)
    t[1, 0] = math.sqrt(ab[1, 0])
    for j in range(1, n):
        t[0, j] = ab[0, j] / t[1, j - 1]
        t[1, j] = math.sqrt(ab[1, j] - t[0, j] ** 2)
    return t


def _solve_banded_tridiag(t: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve A x = b given the upper-form Cholesky factor t of A."""
    n = t.shape[1]
    y = np.empty(n)
    y[0] = b[0] / t[1, 0]
    for i in range(1, n):
        y[i] = (b[i] - t[0, i] * y[i - 1]) / t[1, i]
    x = np.empty(n)
    x[n - 1] = y[n - 1] / t[1, n - 1]
    for i in range(n - 2, -1, -1):
        x[i] = (y[i] - t[0, i + 1] * x[i + 1]) / t[1, i]
    return x


def _chol_inverse_diag(t: np.ndarray) -> np.ndarray:
    """Diagonal + first superdiagonal of A^(-1) from the banded Cholesky
    factor t (port of qso_model.py chol_inverse_diag, including its
    wrapping t[1, j-1] index at j=0 — the produced B[0,0] is unused)."""
    _, nrows = t.shape
    B = np.zeros((2, nrows))
    B[1, nrows - 1] = 1.0 / t[1, nrows - 1] ** 2
    B[0, nrows - 1] = -t[0, nrows - 1] * B[1, nrows - 1] / t[1, nrows - 2]
    for j in reversed(range(nrows - 1)):
        tjj = t[1, j]
        B[1, j] = (1.0 / tjj - t[0, j + 1] * B[0, j + 1]) / tjj
        B[0, j] = -t[0, j] * B[1, j] / t[1, j - 1]
    return B


# --------------------------------------------------------------- engine


def qso_engine(time, data, error, ltau=3.0, lvar=-1.7, sys_err=0.0):
    """Fit quality of a damped random walk (port of qso_model.py:33-229,
    model-free path)."""
    out = {
        "chi2_qso/nu": 999, "chi2_qso/nu_extra": 0.0, "signif_qso": 0.0,
        "signif_not_qso": 0.0, "signif_vary": 0.0, "chi2_qso/nu_NULL": 0.0,
        "chi2/nu": 0.0, "nu": 0, "class": "ambiguous",
    }
    lvar0 = np.log10(0.5) + lvar + ltau
    time = np.asarray(time, dtype=np.float64)
    data = np.asarray(data, dtype=np.float64)
    error = np.asarray(error, dtype=np.float64)

    ln = len(data)
    dt = np.abs(time[1:] - time[:-1])
    g = np.where(dt > 0.0)[0]
    lg = len(g)
    if lg <= 0:
        return out

    if lg < ln:  # drop zero-gap points (keep first of each tie run)
        dt = dt[g]
        gg = np.zeros(lg + 1, dtype=np.int64)
        gg[1:] = g + 1
        dat = data[gg]
        wt = 1.0 / (sys_err**2 + error[gg] ** 2)
        ln = lg + 1
    else:
        dat = 1.0 * data
        wt = 1.0 / (sys_err**2 + error**2)

    out["nu"] = ln - 1.0
    varx = np.var(dat)
    dat0 = (dat * wt).sum() / wt.sum()
    out["chi2/nu"] = ((dat - dat0) ** 2 * wt).sum() / out["nu"]

    # T = L^(-1), tridiagonal, upper banded form
    T = np.zeros((2, ln))
    arg = dt * np.exp(-np.log(10) * ltau)
    ri = np.exp(-arg)
    ei = 1.0 / (1.0 / ri - ri)
    T[0, 1:] = -ei
    T[1, :-1] = 1.0 + ri * ei
    T[1, 1:] += ri * ei
    T[1, ln - 1] += 1.0
    T0 = np.median(T[1, :])
    T = T / T0

    fac = np.exp(np.log(10) * lvar0) / T0
    Tp = 1.0 * T
    Tp[1, :] += wt * fac

    Tpc = _cholesky_banded_tridiag(Tp)
    z = _solve_banded_tridiag(Tpc, wt * dat)
    z0 = _solve_banded_tridiag(Tpc, wt)

    u = T[1, :] * z
    u[1:] += T[0, 1:] * z[:-1]
    u[:-1] += T[0, 1:] * z[1:]
    u0 = T[1, :] * z0
    u0[1:] += T[0, 1:] * z0[:-1]
    u0[:-1] += T[0, 1:] * z0[1:]

    u0sum = u0.sum()
    x0 = u.sum() / u0sum
    out["chi2_qso/nu"] = float(np.dot(dat - x0, u - u0 * x0)) / out["nu"]

    Tc = _cholesky_banded_tridiag(T)
    ldet_Tp = 2 * np.log(Tpc[1, :]).sum()
    ldet_T = 2 * np.log(Tc[1, :]).sum()
    ldet_C = ldet_Tp - ldet_T - np.log(wt).sum()
    out["chi2_qso/nu_extra"] = (ldet_C + np.log(u0sum)) / out["nu"]

    Tpm = _chol_inverse_diag(Tpc)
    diagC = T[1, :] * wt * Tpm[1, :]
    diagC[:-1] += T[0, 1:] * wt[:-1] * Tpm[0, 1:]
    diagC[1:] += T[0, 1:] * wt[1:] * Tpm[0, 1:]
    TrC = diagC.sum()

    out["chi2_qso/nu_NULL"] = TrC * varx / out["nu"]
    a = ln / 2.0
    x = (out["chi2_qso/nu"] + 1.0e-8) / (
        out["chi2_qso/nu_NULL"] + out["chi2_qso/nu"] + 1.0e-8
    )
    prob = _betainc(a, a, x)
    if prob <= 0:
        lprob = a * np.log(x) - np.log(a) + _gammaln(2 * a) - 2 * _gammaln(a)
    else:
        lprob = np.log(prob)
    out["signif_qso"] = _lprob2sigma(lprob)

    x = 1.0 / (1.0 + out["chi2_qso/nu"])
    prob = _betainc(a, a, x)
    if prob <= 0:
        lprob = a * np.log(x) - np.log(a) + _gammaln(2 * a) - 2 * _gammaln(a)
    else:
        lprob = np.log(prob)
    out["signif_not_qso"] = _lprob2sigma(lprob)

    x = out["chi2/nu"] * out["nu"]
    prob = _gammaincc(0.5 * out["nu"], 0.5 * x)
    if prob <= 0:
        lprob = (
            (0.5 * out["nu"] - 1) * np.log(x)
            - 0.5 * x
            - 0.5 * out["nu"] * np.log(2)
            - _gammaln(0.5 * out["nu"])
        )
    else:
        lprob = np.log(prob)
    out["signif_vary"] = _lprob2sigma(lprob)

    if out["signif_vary"] > 3:
        if out["signif_qso"] > 3:
            out["class"] = "qso"
        elif out["signif_not_qso"] > 3:
            out["class"] = "not_qso"
    return out


_FILTER_PARS = {
    "u": [-3.90, 0.12, 2.73, -0.02],
    "g": [-4.10, 0.14, 2.92, -0.07],
    "r": [-4.34, 0.20, 3.12, -0.15],
    "i": [-4.23, 0.05, 2.83, 0.07],
    "z": [-4.44, 0.13, 3.06, -0.07],
}


def qso_fit(time, data, error, filter="g", mag0=19.0, sys_err=0.0):
    """Sesar Stripe-82 parametrized DRW fit (port of qso_model.py:232-312)."""
    data = np.asarray(data, dtype=np.float64)
    data = data - np.median(data) + mag0
    par = _FILTER_PARS[filter.lower()]
    lvar = par[0] + par[1] * (mag0 - 19.0)
    ltau = par[2] + par[3] * (mag0 - 19.0)
    adict = qso_engine(time, data, error, ltau=ltau, lvar=lvar, sys_err=sys_err)
    out = {
        "lvar": lvar,
        "ltau": ltau,
        "chi2/nu": adict["chi2/nu"],
        "nu": adict["nu"],
        "chi2_qso/nu": adict["chi2_qso/nu"],
        "chi2_qso/nu_NULL": adict["chi2_qso/nu_NULL"],
        "signif_qso": adict["signif_qso"],
        "signif_not_qso": adict["signif_not_qso"],
        "signif_vary": adict["signif_vary"],
        "class": adict["class"],
        "chi2qso_nu_nuNULL_ratio": adict["chi2_qso/nu"] / adict["chi2_qso/nu_NULL"],
        "log_chi2_qsonu": np.log(adict["chi2_qso/nu"]),
        "log_chi2nuNULL_chi2nu": np.log(
            adict["chi2_qso/nu_NULL"] / adict["chi2_qso/nu"]
        ),
    }
    return out


def qso_log_chi2_qsonu(qso_model):
    """Natural log of chi^2_qso/nu of the DRW fit."""
    return qso_model["log_chi2_qsonu"]


def qso_log_chi2nuNULL_chi2nu(qso_model):
    """Natural log of chi^2_qso/nu_NULL over chi^2_qso/nu."""
    return qso_model["log_chi2nuNULL_chi2nu"]
