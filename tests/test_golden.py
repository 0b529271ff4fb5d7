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


def test_period_fast_golden_proximity(golden):
    """period_fast vs the reference's own expected values for the 3
    vendored series: the reference's numbers sit exactly on the two-pass
    scan lattice omega_min + k*(width/500) (verified below), and our
    gatspy-shaped reimplementation must land within a few fine-grid bins
    (relative period error <= 1.5e-3, typically ~3e-5). Bit-exactness is
    unreachable offline (gatspy's private extirpolation float pattern);
    this bound replaces it as the quantitative anchor."""
    from cesium_spark.features.period_fast import period_fast

    series, names, expected = golden
    col = names.index("period_fast")
    for row, (fname, t, m, e) in enumerate(series):
        want = expected[row, col]
        # reference value sits on the two-pass lattice (integer k)
        baseline = t.max() - t.min()
        width = 2 * np.pi / baseline
        omega_min = 2 * np.pi / baseline
        k = (2 * np.pi / want - omega_min) / (width / 500)
        assert abs(k - round(k)) < 1e-3, fname
        got = period_fast(t, m, e)
        assert abs(got - want) / want < 1.5e-3, (fname, got, want)


def test_lsfast_trig_sums_match_direct_evaluation():
    """The extirpolated fast periodogram must agree with the direct
    (exact) evaluation of the same power formula to the documented
    approximation scale, and exactly recover an injected frequency."""
    from cesium_spark.features.lsfast import lomb_scargle_fast_grid

    rng = np.random.RandomState(4)
    t = np.sort(rng.uniform(0, 40, 250))
    y = np.sin(2 * np.pi * t / 3.3) + 0.1 * rng.normal(size=250)
    dy = np.full(250, 0.1)
    f0, df, nf = 0.02, 0.0008, 800
    fast = lomb_scargle_fast_grid(t, y, dy, f0, df, nf)
    slow = lomb_scargle_fast_grid(t, y, dy, f0, df, nf, use_fft=False)
    assert np.max(np.abs(fast - slow)) < 0.02
    assert abs((f0 + df * np.argmax(fast)) - 1 / 3.3) < 2 * df
