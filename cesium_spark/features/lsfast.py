"""Press & Rybicki (1989) fast Lomb-Scargle periodogram with floating
mean and measurement-error weights — the algorithm behind gatspy's
LombScargleFast / astropy's method='fast' (VanderPlas & Ivezic 2015,
ApJ 812, 18; Press & Rybicki 1989, ApJ 338, 277).

The trig sums Σ w_i sin(2π f t_i), Σ w_i cos(2π f t_i) over a REGULAR
frequency grid f = f0 + df*arange(N) are evaluated with one FFT after
"extirpolating" the weights onto a uniform grid (Lagrange spreading over
Mfft=4 adjacent grid points) — O(N log N) in place of O(N_f * n).

Implemented from the published formalism to reproduce the reference's
`period_fast` (which wraps gatspy) EXACTLY — the golden expected-feature
values pin the result; see features/period_fast.py for the two-pass
optimizer that consumes this.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lomb_scargle_fast_grid", "trig_sum", "extirpolate"]


def _bitceil(n: int) -> int:
    """Smallest power of 2 >= n."""
    return 1 << int(max(n - 1, 0)).bit_length()


def extirpolate(x, y, N: int, M: int = 4) -> np.ndarray:
    """Spread weights y at real positions x onto an integer grid of size
    N via M-point Lagrange interpolation (the PR89 'extirpolation')."""
    x = np.ravel(np.asarray(x, dtype=np.float64))
    y = np.ravel(np.asarray(y))
    result = np.zeros(N, dtype=y.dtype)

    # exact integer positions accumulate directly
    is_int = (x % 1 == 0)
    if is_int.any():
        np.add.at(result, x[is_int].astype(int), y[is_int])
        x, y = x[~is_int], y[~is_int]
    if len(x) == 0:
        return result

    import math

    ilo = np.clip((x - M // 2).astype(int), 0, N - M)
    # numerator: y_i * prod_k (x_i - ilo_i - k)
    numerator = y * np.prod(x - ilo - np.arange(M)[:, np.newaxis], 0)
    denominator = float(math.factorial(M - 1))
    for j in range(M):
        if j > 0:
            denominator *= j / (j - M)
        ind = ilo + (M - 1 - j)
        np.add.at(result, ind, numerator / (denominator * (x - ind)))
    return result


def trig_sum(
    t,
    h,
    df: float,
    N: int,
    f0: float = 0.0,
    freq_factor: float = 1.0,
    oversampling: int = 5,
    Mfft: int = 4,
):
    """(S, C) with S_j = sum h_i sin(2π f_j t_i), C_j likewise with cos,
    over f_j = freq_factor * (f0 + j df), via extirpolation + one IFFT."""
    df = df * freq_factor
    f0 = f0 * freq_factor
    if df <= 0:
        raise ValueError("df must be positive")
    t = np.asarray(t, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)

    Nfft = _bitceil(int(N * oversampling))
    t0 = t.min()
    if f0 != 0:
        h = h * np.exp(2j * np.pi * f0 * (t - t0))
    tnorm = ((t - t0) * Nfft * df) % Nfft
    grid = extirpolate(tnorm, h, Nfft, Mfft)
    fftgrid = np.fft.ifft(grid)[:N]
    if t0 != 0:
        f = f0 + df * np.arange(N)
        fftgrid = fftgrid * np.exp(2j * np.pi * t0 * f)
    C = Nfft * fftgrid.real
    S = Nfft * fftgrid.imag
    return S, C


def lomb_scargle_fast_grid(
    t,
    y,
    dy,
    f0: float,
    df: float,
    Nf: int,
    center_data: bool = True,
    fit_offset: bool = True,
    use_fft: bool = True,
    **trig_kwds,
) -> np.ndarray:
    """Standard-normalized floating-mean LS power on the regular grid
    f = f0 + df*arange(Nf) — the PR89/gatspy evaluation path."""
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dy = np.asarray(dy, dtype=np.float64)

    w = dy ** -2.0
    w = w / w.sum()

    if center_data or fit_offset:
        y = y - np.dot(w, y)

    def _sum(h, ff):
        if use_fft:
            return trig_sum(t, h, df, Nf, f0, freq_factor=ff, **trig_kwds)
        f = ff * (f0 + df * np.arange(Nf))
        arg = 2 * np.pi * np.outer(f, t)
        return np.dot(np.sin(arg), h), np.dot(np.cos(arg), h)

    Sh, Ch = _sum(w * y, 1)
    S2, C2 = _sum(w, 2)
    if fit_offset:
        S, C = _sum(w, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            tan_2omega_tau = (S2 - 2 * S * C) / (C2 - (C * C - S * S))
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            tan_2omega_tau = S2 / C2

    S2w = tan_2omega_tau / np.sqrt(1 + tan_2omega_tau * tan_2omega_tau)
    C2w = 1 / np.sqrt(1 + tan_2omega_tau * tan_2omega_tau)
    Cw = np.sqrt(0.5) * np.sqrt(1 + C2w)
    Sw = np.sqrt(0.5) * np.sign(S2w) * np.sqrt(1 - C2w)

    YY = np.dot(w, y * y)
    YC = Ch * Cw + Sh * Sw
    YS = Sh * Cw - Ch * Sw
    CC = 0.5 * (1 + C2 * C2w + S2 * S2w)
    SS = 0.5 * (1 - C2 * C2w - S2 * S2w)
    if fit_offset:
        CC = CC - (C * Cw + S * Sw) ** 2
        SS = SS - (S * Cw - C * Sw) ** 2

    with np.errstate(divide="ignore", invalid="ignore"):
        power = YC * YC / CC + YS * YS / SS
        power = power / YY
    return power
