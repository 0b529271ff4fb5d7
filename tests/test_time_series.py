"""TimeSeries class parity: ported from
/root/reference/cesium/tests/test_time_series.py (all 8 cases)."""

import os
from uuid import uuid4

import numpy as np
import numpy.testing as npt
import pytest

from cesium_spark import time_series
from cesium_spark.time_series import DEFAULT_ERROR_VALUE, DEFAULT_MAX_TIME, TimeSeries


def sample_time_series(size=51, channels=1, seed=None):
    rng = np.random.RandomState(seed if seed is not None else 1)
    times = np.array([np.sort(rng.random(size)) for _ in range(channels)]).squeeze()
    values = np.array([rng.normal(size=size) for _ in range(channels)]).squeeze()
    errors = np.array([rng.exponential(size=size) for _ in range(channels)]).squeeze()
    return times, values, errors


def test__compatible_shapes():
    compat = time_series._compatible_shapes
    assert compat(np.arange(5), np.arange(5))
    assert not compat(np.arange(5), np.arange(6))
    assert compat([np.arange(5)] * 5, [np.arange(5)] * 5)
    assert not compat([np.arange(5)] * 5, [np.arange(5)] * 6)
    assert not compat([np.arange(5)] * 5, [np.arange(6)] * 5)
    assert not compat(np.arange(5), [np.arange(6)] * 5)
    assert compat([[0, 1], [0, 1]], [[0, 1], [0, 1]])
    assert not compat([[0, 1], [0, 1]], [[0], [0, 1]])
    assert compat([0, 1], np.arange(2))


def assert_ts_equal(ts1, ts2):
    for x1, x2 in zip((ts1.time, ts1.measurement, ts1.error),
                      (ts2.time, ts2.measurement, ts2.error)):
        if isinstance(x1, np.ndarray):
            assert isinstance(x2, np.ndarray) and np.array_equal(x1, x2)
        else:
            assert not isinstance(x2, np.ndarray)
            assert all(np.array_equal(a, b) for a, b in zip(x1, x2))
    assert ts1.label == ts2.label
    assert ts1.meta_features == ts2.meta_features
    assert ts1.name == ts2.name


def test_init_1d():
    t, m, e = sample_time_series(channels=1)
    ts = TimeSeries(t, m, e)
    assert ts.time.shape == t.shape and np.allclose(ts.time, t)
    assert ts.measurement.shape == m.shape and np.allclose(ts.measurement, m)
    assert ts.error.shape == e.shape and np.allclose(ts.error, e)
    assert ts.n_channels == 1


def test_init_2d():
    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)
    ts = TimeSeries(t, m, e)
    assert ts.time.shape == t.shape and np.allclose(ts.time, t)
    assert ts.n_channels == n_channels

    ts = TimeSeries(t[0], m, e[0])  # shared 1-d t/e broadcast
    assert ts.time.shape == m.shape and np.allclose(ts.time[0], t[0])
    assert ts.error.shape == m.shape and np.allclose(ts.error[0], e[0])
    assert ts.n_channels == n_channels


def test_init_ragged():
    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)
    t = [t[i][: i + 2] for i in range(len(t))]
    m = [m[i][: i + 2] for i in range(len(m))]
    e = [e[i][: i + 2] for i in range(len(e))]
    ts = TimeSeries(t, m, e)
    assert all(np.allclose(ts.time[i], np.sort(t[i])) for i in range(n_channels))
    assert ts.n_channels == n_channels
    # ragged m with shared 1-d t is an error (reference raises too)
    with pytest.raises(ValueError, match="each channel"):
        TimeSeries(np.arange(4, dtype=float), m, None)


def test_default_values():
    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)
    ts = TimeSeries(None, m[0], None)
    npt.assert_allclose(ts.time, np.linspace(0.0, DEFAULT_MAX_TIME, m.shape[1]))
    npt.assert_allclose(ts.error, np.repeat(DEFAULT_ERROR_VALUE, m.shape[1]))
    assert ts.n_channels == 1

    ts = TimeSeries(None, m, None)
    npt.assert_allclose(ts.time[0], np.linspace(0.0, DEFAULT_MAX_TIME, m.shape[1]))
    npt.assert_allclose(ts.error[0], np.repeat(DEFAULT_ERROR_VALUE, m.shape[1]))
    assert ts.n_channels == n_channels

    m_r = [m[i][: i + 2] for i in range(len(m))]
    ts = TimeSeries(None, m_r, None)
    for i in range(n_channels):
        npt.assert_allclose(
            ts.time[i], np.linspace(0.0, DEFAULT_MAX_TIME, len(m_r[i])))
        npt.assert_allclose(
            ts.error[i], np.repeat(DEFAULT_ERROR_VALUE, len(m_r[i])))

    # t-only construction fills m with NaN
    ts = TimeSeries(np.linspace(0, 1, 5), None, None)
    assert np.isnan(ts.measurement).all()

    with pytest.raises(ValueError, match="times or measurements"):
        TimeSeries(None, None, None)


def test_channels_iterator():
    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)
    ts = TimeSeries(t[0], m[0], e[0])
    for t_i, m_i, e_i in ts.channels():
        npt.assert_allclose(t_i, t[0])
        npt.assert_allclose(m_i, m[0])

    ts = TimeSeries(t, m, e)
    for (t_i, m_i, e_i), i in zip(ts.channels(), range(n_channels)):
        npt.assert_allclose(t_i, t[i])
        npt.assert_allclose(m_i, m[i])

    t_r = [t[i][: i + 2] for i in range(len(t))]
    m_r = [m[i][: i + 2] for i in range(len(m))]
    e_r = [e[i][: i + 2] for i in range(len(e))]
    ts = TimeSeries(t_r, m_r, e_r)
    for (t_i, m_i, e_i), i in zip(ts.channels(), range(n_channels)):
        npt.assert_allclose(t_i, np.sort(t_r[i]))


def test_npz_roundtrip(tmp_path):
    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)

    for ts in (
        TimeSeries(t[0], m[0], e[0], name="a", label="L",
                   meta_features={"z": 1.5}),
        TimeSeries(t[0], m, e[0]),
    ):
        p = os.path.join(str(tmp_path), str(uuid4()) + ".npz")
        ts.save(p)
        assert_ts_equal(ts, time_series.load(p))

    t_r = [t[i][: i + 2] for i in range(len(t))]
    m_r = [m[i][: i + 2] for i in range(len(m))]
    e_r = [e[i][: i + 2] for i in range(len(e))]
    ts = TimeSeries(t_r, m_r, e_r)
    p = os.path.join(str(tmp_path), str(uuid4()) + ".npz")
    ts.save(p)
    assert_ts_equal(ts, time_series.load(p))


def test_sort():
    t, m, e = sample_time_series(channels=1)
    t[:2] = t[1::-1]
    ts = TimeSeries(t, m, e)
    npt.assert_allclose(ts.time, np.sort(t))
    npt.assert_allclose(ts.measurement, m[np.argsort(t)])
    npt.assert_allclose(ts.error, e[np.argsort(t)])

    n_channels = 3
    t, m, e = sample_time_series(channels=n_channels)
    t[:, :2] = t[:, 1::-1]
    ts = TimeSeries(t, m, e)
    for i in range(n_channels):
        npt.assert_allclose(ts.time[i], np.sort(t[i]))
        npt.assert_allclose(ts.measurement[i], m[i][np.argsort(t[i])])

    ts = TimeSeries(t[0], m, e[0])
    for i in range(n_channels):
        npt.assert_allclose(ts.time[i], np.sort(t[0]))
        npt.assert_allclose(ts.measurement[i], m[i][np.argsort(t[0])])


def test_featurize_single_ts_accepts_time_series():
    """The reference's featurize_single_ts(ts, features) call shape."""
    from cesium_spark.api import featurize_single_ts

    t, m, e = sample_time_series(channels=1)
    ts = TimeSeries(t, m, e, meta_features={"meta1": 0.5})
    got = featurize_single_ts(ts, ["mean", "amplitude"])
    want = featurize_single_ts(t, m, e, features_to_use=["mean", "amplitude"])
    npt.assert_allclose(got["mean"], want["mean"], rtol=1e-12)
    assert got["meta1"] == 0.5

    t3, m3, e3 = sample_time_series(channels=3)
    got3 = featurize_single_ts(TimeSeries(t3, m3, e3), ["mean"])
    for ch in range(3):
        want_ch = featurize_single_ts(t3[ch], m3[ch], e3[ch],
                                      features_to_use=["mean"])
        npt.assert_allclose(got3[f"mean_{ch}"], want_ch["mean"], rtol=1e-12)
