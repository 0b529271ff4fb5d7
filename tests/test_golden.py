"""Golden end-to-end parity with the reference: featurize the 3 vendored
ASAS light curves and compare to expected_features.csv (the reference's own
bit-level anchor, features/tests/test_graphs.py:14-46) to ~1e-6.

Scope grows with the registry: NOT_YET tracks the remaining unimplemented
columns (asserted NaN via the NotImplementedError -> NaN policy)."""

import math

import numpy as np
import numpy.testing as npt
import pytest

from cesium_spark.features.registry import (
    GENERAL_FEATS,
    LOMB_SCARGLE_FEATS,
    compute_features,
)

# period_fast is implemented as a documented approximation (the reference
# wraps gatspy, whose exact optimizer internals aren't reproducible
# offline) -> excluded from the golden-value comparison, covered by the
# synthetic period-recovery test below.
APPROXIMATE = {"period_fast"}

FAST_IMPLEMENTED = [f for f in GENERAL_FEATS if f not in APPROXIMATE]


def _check(golden, feats):
    series, names, expected = golden
    for row, (fname, t, m, e) in enumerate(series):
        vals = compute_features(t, m, e, feats)
        got = np.array([vals[n] for n in feats])
        want = np.array([expected[row, names.index(n)] for n in feats])
        npt.assert_array_almost_equal(got, want, err_msg=f"series {fname}")


def test_golden_general_features(golden):
    _check(golden, FAST_IMPLEMENTED)


@pytest.mark.slow
def test_golden_lomb_scargle_features(golden):
    """All 47 periodic features on all 3 series (~40 s: the reference's
    111k-point frequency grids)."""
    _check(golden, LOMB_SCARGLE_FEATS)


def test_lomb_scargle_recovers_known_frequencies():
    """Synthetic signal recovery (reference test_lomb_scargle_features.py):
    on-grid sinusoids at 5.3/3.3/2.1 with harmonic amplitudes."""
    from cesium_spark.features.lomb import lomb_scargle_model

    freqs = np.array([5.3, 3.3, 2.1])
    amps = np.array([[1, 0.05, 0.01, 0.005]]) * np.array([[1], [0.5], [0.25]])
    t = np.linspace(0, 2, 501)
    m = np.zeros(501)
    for (i, j), a in np.ndenumerate(amps):
        m += a * np.sin(2 * np.pi * t * freqs[i] * (j + 1) + 0.1)
    e = 1e-4 * np.ones(501)
    model = lomb_scargle_model(t, m, e)
    got = [model["freq_fits"][i]["freq"] for i in range(3)]
    npt.assert_allclose(got, freqs, rtol=1e-2)
    npt.assert_allclose(
        [model["freq_fits"][i]["amplitude"][0] for i in range(3)],
        [1.0, 0.5, 0.25], rtol=0.1,
    )


def test_qso_regression_constants():
    """Reference hard-coded values (test_general_features.py:228-233)."""
    st = np.random.RandomState(0)
    t = np.sort(st.uniform(0, 10, 50))
    m = st.normal(1, 1, 50)
    e = st.exponential(0.1, 50)
    v = compute_features(t, m, e, ["qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu"])
    npt.assert_allclose(v["qso_log_chi2_qsonu"], 6.9844064754)
    npt.assert_allclose(v["qso_log_chi2nuNULL_chi2nu"], -0.456526327522)


def test_period_fast_recovers_injected_period():
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0, 30, 300))
    for p in (0.73, 2.5, 7.7):
        m = 2.0 + np.sin(2 * np.pi * t / p) + 0.05 * rng.normal(size=300)
        e = np.full(300, 0.05)
        v = compute_features(t, m, e, ["period_fast"])
        npt.assert_allclose(v["period_fast"], p, rtol=5e-3)
