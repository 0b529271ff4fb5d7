"""impute_featureset reference parity: ported from
/root/reference/cesium/tests/test_featurize.py::test_impute (Spark path —
the engine's featureset is a DataFrame, so `.values` mutation cases map
to column expressions; `inplace` has no Spark meaning and is not ported).
"""

import numpy as np
import pandas as pd
import pytest

from cesium_spark.api import impute_featureset


def _fset(spark, amplitude, meta1, names):
    pdf = pd.DataFrame(
        {"name": names, "amplitude": amplitude, "meta1": meta1}
    )
    return spark.createDataFrame(pdf)


def _col(df, c):
    return (
        df.toPandas().sort_values("name").reset_index(drop=True)[c].to_numpy()
    )


def test_impute_reference_parity(spark):
    rng = np.random.RandomState(20)
    names = ["a", "b", "c", "d", "e"]
    amp = rng.uniform(0.5, 10.0, 5)
    meta = rng.uniform(0.0, 1.0, 5)

    # no missing values: every strategy is the identity
    clean = _fset(spark, amp, meta, names)
    np.testing.assert_allclose(_col(impute_featureset(clean), "amplitude"), amp)

    # inf at row 0, nan at row 1 (the reference's setup)
    amp_miss = amp.copy()
    amp_miss[0] = np.inf
    amp_miss[1] = np.nan
    fset = _fset(spark, amp_miss, meta, names)
    amp_values = amp[2:]
    other_values = np.concatenate([amp[2:], meta])  # all non-missing feats

    # constant, default value: -2 * global nanmax(|values|)
    got = _col(impute_featureset(fset, strategy="constant", value=None),
               "amplitude")
    np.testing.assert_allclose(-2 * np.nanmax(np.abs(other_values)), got[:2])
    np.testing.assert_allclose(amp_values, got[2:])

    # constant, explicit value
    got = _col(impute_featureset(fset, strategy="constant", value=-1e4),
               "amplitude")
    np.testing.assert_allclose(-1e4, got[:2])

    # mean / median over the column's non-missing values
    got = _col(impute_featureset(fset, strategy="mean"), "amplitude")
    np.testing.assert_allclose(np.mean(amp_values), got[:2])
    np.testing.assert_allclose(amp_values, got[2:])

    got = _col(impute_featureset(fset, strategy="median"), "amplitude")
    np.testing.assert_allclose(np.median(amp_values), got[:2])
    np.testing.assert_allclose(amp_values, got[2:])

    # most_frequent: all-distinct values -> smallest wins (scipy.stats.mode
    # tiebreak, = Spark mode(col, deterministic=True))
    got = _col(impute_featureset(fset, strategy="most_frequent"), "amplitude")
    np.testing.assert_allclose(np.min(amp_values), got[:2])
    np.testing.assert_allclose(amp_values, got[2:])

    # true modal value beats the smallest when frequencies differ
    dup = _fset(spark, np.array([np.nan, 7.0, 7.0, 3.0, 9.0]), meta, names)
    got = _col(impute_featureset(dup, strategy="most_frequent"), "amplitude")
    assert got[0] == 7.0

    # unknown strategy raises like the reference
    with pytest.raises(NotImplementedError):
        impute_featureset(fset, strategy="blah")


def test_impute_max_value_treats_huge_as_missing(spark):
    """|x| > max_value is missing (the reference's overflow guard), and
    non-feature columns (string keys) pass through untouched."""
    names = ["a", "b", "c", "d"]
    fset = _fset(spark, np.array([1e30, 2.0, 4.0, 6.0]),
                 np.array([0.1, 0.2, 0.3, 0.4]), names)
    out = impute_featureset(fset, strategy="mean", max_value=1e20)
    got = _col(out, "amplitude")
    np.testing.assert_allclose(got, [4.0, 2.0, 4.0, 6.0])
    assert sorted(out.toPandas()["name"]) == names
