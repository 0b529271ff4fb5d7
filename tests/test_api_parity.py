"""featurize_time_series reference-shape parity: ported from
/root/reference/cesium/tests/test_featurize.py (default times/errors,
uneven multichannel, pandas meta_features)."""

import numpy as np
import pandas as pd
import pytest

from cesium_spark.api import featurize_single_ts, featurize_time_series


def _sample_values(channels=1, n=30, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0, 10, n))
    m = rng.normal(5, 1, (channels, n)) if channels > 1 else rng.normal(5, 1, n)
    e = rng.exponential(0.1, (channels, n)) if channels > 1 else rng.exponential(0.1, n)
    return t, m, e


def test_default_times(spark):
    """times=None -> linspace(0, 1, n) per channel (reference
    test_featurize_time_series_default_times, incl. the ragged form)."""
    _, m, e = _sample_values(channels=3)
    fset = featurize_time_series(spark, None, m, e, ["amplitude", "mean"])
    assert "amplitude_0" in fset.columns and len(fset) == 1

    # ragged: one series, 3 channels of different lengths
    m_r = [[m[0], m[1][:-5], m[2][:-10]]]
    e_r = [[e[0], e[1][:-5], e[2][:-10]]]
    fset = featurize_time_series(spark, None, m_r, e_r, ["amplitude"])
    assert "amplitude_2" in fset.columns and len(fset) == 1

    # single 1-d series
    fset = featurize_time_series(spark, None, m[0], e[0], ["amplitude", "mean"])
    want = featurize_single_ts(
        np.linspace(0.0, 1.0, len(m[0])), m[0], e[0],
        features_to_use=["amplitude", "mean"])
    np.testing.assert_allclose(fset.iloc[0]["mean"], want["mean"], rtol=1e-12)


def test_default_errors(spark):
    """errors=None -> DEFAULT_ERROR_VALUE fill, all input shapes
    (reference test_featurize_time_series_default_errors)."""
    t, m, _ = _sample_values(channels=3)
    fset = featurize_time_series(spark, t, m, None, ["amplitude", "weighted_average"])
    assert "amplitude_0" in fset.columns

    t_r = [[t, t[:-5], t[:-10]]]
    m_r = [[m[0], m[1][:-5], m[2][:-10]]]
    fset = featurize_time_series(spark, t_r, m_r, None, ["amplitude"])
    assert len(fset) == 1

    fset = featurize_time_series(spark, t, m[0], None, ["weighted_average"])
    want = featurize_single_ts(t, m[0], None, features_to_use=["weighted_average"])
    np.testing.assert_allclose(
        fset.iloc[0]["weighted_average"], want["weighted_average"], rtol=1e-12)


def test_uneven_multichannel_values(spark):
    """Ragged channels featurize independently and match the per-channel
    single-ts evaluation (reference
    test_featurize_time_series_uneven_multichannel)."""
    t, m, e = _sample_values(channels=3)
    t_r = [t, t[:-5], t[:-10]]
    m_r = [m[0], m[1][:-5], m[2][:-10]]
    e_r = [e[0], e[1][:-5], e[2][:-10]]
    fset = featurize_time_series(spark, [t_r], [m_r], [e_r], ["mean", "std"])
    for ch in range(3):
        want = featurize_single_ts(t_r[ch], m_r[ch], e_r[ch],
                                   features_to_use=["mean", "std"])
        np.testing.assert_allclose(fset.iloc[0][f"mean_{ch}"], want["mean"],
                                   rtol=1e-12)


def test_pandas_meta_features(spark):
    """meta_features as dict / Series / DataFrame attach as constant
    columns (reference test_featurize_time_series_pandas_metafeatures)."""
    t, m, e = _sample_values()
    fset = featurize_time_series(
        spark, t, m, e, ["amplitude"], meta_features=pd.Series({"meta1": 0.5}))
    np.testing.assert_allclose(fset["meta1"], 0.5)

    n_series = 5
    series = [_sample_values(seed=i) for i in range(n_series)]
    times, values, errors = (list(x) for x in zip(*series))
    meta = pd.DataFrame({"meta1": [0.5] * n_series, "meta2": [0.8] * n_series})
    fset = featurize_time_series(
        spark, times, values, errors, ["amplitude"], meta_features=meta)
    np.testing.assert_allclose(fset["meta1"], 0.5)
    np.testing.assert_allclose(fset["meta2"], 0.8)
    assert len(fset) == n_series

    with pytest.raises(ValueError, match="meta_features rows"):
        featurize_time_series(
            spark, times, values, errors, ["amplitude"],
            meta_features=pd.DataFrame({"meta1": [1.0]}))


def test_length_mismatch_raises(spark):
    t, m, e = _sample_values()
    with pytest.raises(ValueError, match="lengths differ"):
        featurize_time_series(spark, t[:-3], m, e, ["mean"])


def test_custom_script_path_accepted_and_ignored(spark):
    """Signature parity with the reference (featurize.py:28,155): both
    entry points accept custom_script_path; core ignores it — so drop-in
    callers that pass it keep working, with zero behavior change."""
    t = np.linspace(0, 10, 25)
    m = np.sin(t)
    a = featurize_single_ts(t, m, None, ["mean", "amplitude"],
                            custom_script_path="/nonexistent/custom.py")
    b = featurize_single_ts(t, m, None, ["mean", "amplitude"])
    assert a == b
    fa = featurize_time_series(spark, t, m, None, ["mean"],
                               custom_script_path="/nonexistent/custom.py")
    fb = featurize_time_series(spark, t, m, None, ["mean"])
    pd.testing.assert_frame_equal(fa, fb)


def test_reference_positional_call_shape_timeseries(spark):
    """Review finding (r4): the reference's fully positional call
    featurize_single_ts(ts, features, custom_script_path, custom_funcs)
    must bind correctly through our (t, m, e, features_to_use, ...)
    parameter list — the funcs dict landing on features_to_use is
    re-bound, and the script path (3rd position) is ignored."""
    from cesium_spark.time_series import TimeSeries

    t = np.linspace(0, 10, 30)
    m = np.sin(t)
    ts = TimeSeries(t, m)
    funcs = {"double_mean": lambda t_, m_, e_: 2.0 * np.mean(m_)}
    got = featurize_single_ts(ts, ["mean", "double_mean"],
                              "/nonexistent/custom.py", funcs)
    want = featurize_single_ts(
        ts, ["mean", "double_mean"], custom_functions=funcs)
    assert got == want and abs(got["double_mean"] - 2 * np.mean(m)) < 1e-12
