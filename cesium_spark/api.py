"""cesium-shaped public API: the reference's top-level entry points
(/root/reference/cesium/featurize.py:25-291) re-expressed over the Spark
kernel, so a cesium user's first lines of code port verbatim.

- featurize_single_ts(t, m, e, features): one in-memory series ->
  {feature: value} dict, evaluated directly through the registry graph
  (no cluster round-trip for one series — same numbers as the kernel,
  which golden-parity tests anchor).
- featurize_time_series(spark, times, values, errors, ...): the
  versatile array-shaped entry — single series, list of series, or
  (p, n) multichannel — assembled into the engine's long format and
  featurized by the distributed kernel; returns a pandas featureset
  indexed by series name (flat columns; ``{feature}_{channel}`` for
  multichannel), the flattened form of cesium's MultiIndex.

Reference parity notes: raise_exceptions defaults True here like the
reference's public functions (the engine-internal featurize() defaults
False = NaN policy); errors default to cesium's DEFAULT_ERROR_VALUE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .features.registry import compute_features
from .kernel import DEFAULT_ERROR_VALUE, featurize
from .operators.impute import impute_featureset  # noqa: F401  (public API)

__all__ = ["featurize_single_ts", "featurize_time_series", "impute_featureset"]


def featurize_single_ts(
    t,
    m,
    e=None,
    features_to_use=(),
    custom_functions=None,
    raise_exceptions: bool = True,
) -> dict:
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    e = (
        np.full_like(t, DEFAULT_ERROR_VALUE)
        if e is None
        else np.asarray(e, dtype=np.float64)
    )
    order = np.argsort(t, kind="stable")
    return compute_features(
        t[order], m[order], e[order], list(features_to_use),
        custom_functions=custom_functions, raise_exceptions=raise_exceptions,
    )


def _as_series_list(x):
    """Normalize the reference's accepted shapes to a list of per-series
    arrays (each (n,) or (p, n)). None entries pass through (a series
    with no error arrays gets the DEFAULT_ERROR_VALUE fill downstream)."""
    if isinstance(x, (list, tuple)):
        return [
            None if s is None else np.asarray(s, dtype=np.float64) for s in x
        ]
    arr = np.asarray(x, dtype=np.float64)
    return [arr]


def featurize_time_series(
    spark,
    times,
    values,
    errors=None,
    features_to_use=(),
    names=None,
    custom_functions=None,
    raise_exceptions: bool = True,
) -> pd.DataFrame:
    features = list(features_to_use)
    ts_list = _as_series_list(times)
    m_list = _as_series_list(values)
    e_list = (
        [None] * len(ts_list) if errors is None else _as_series_list(errors)
    )
    if not (len(ts_list) == len(m_list) == len(e_list)):
        raise ValueError("times/values/errors series counts differ")
    names = (
        [str(n) for n in names]
        if names is not None
        else [str(i) for i in range(len(ts_list))]
    )

    n_channels = max(
        (m.shape[0] if m.ndim == 2 else 1) for m in m_list
    )
    # columnar assembly: one concat of per-series frames, never a
    # per-point Python tuple loop (Arrow takes the whole block at once)
    frames = []
    for name, t, m, e in zip(names, ts_list, m_list, e_list):
        t2 = np.atleast_2d(np.asarray(t, dtype=np.float64))
        m2 = np.atleast_2d(m)
        if e is None:
            e2 = np.full_like(m2, DEFAULT_ERROR_VALUE)
        else:
            e2 = np.atleast_2d(np.asarray(e, dtype=np.float64))
        # cesium broadcasts shared 1-d t/e across channels
        if t2.shape[0] == 1 and m2.shape[0] > 1:
            t2 = np.broadcast_to(t2, m2.shape)
        if e2.shape[0] == 1 and m2.shape[0] > 1:
            e2 = np.broadcast_to(e2, m2.shape)
        p, n = m2.shape
        frames.append(
            pd.DataFrame(
                {
                    "series": np.repeat(np.array(name, dtype=object), p * n),
                    "channel": np.repeat(np.arange(p, dtype=np.int64), n),
                    "idx": np.tile(np.arange(n, dtype=np.int64), p),
                    "t": t2.astype(np.float64, copy=False).ravel(),
                    "m": m2.astype(np.float64, copy=False).ravel(),
                    "e": e2.astype(np.float64, copy=False).ravel(),
                }
            )
        )
    long = spark.createDataFrame(pd.concat(frames, ignore_index=True))

    def _one_channel(ch):
        part = long.filter(long["channel"] == ch)
        return featurize(
            part, features,
            key_col="series", tiebreak_col="idx",
            t="t", m="m", e="e", ts_col="t",
            custom_functions=custom_functions,
            raise_exceptions=raise_exceptions,
        )

    if n_channels == 1:
        out = _one_channel(0).toPandas().set_index("series")
    else:
        merged = None
        for ch in range(n_channels):
            part = _one_channel(ch).toPandas().set_index("series")
            part.columns = [f"{c}_{ch}" for c in part.columns]
            merged = part if merged is None else merged.join(part, how="outer")
        out = merged
    return out.sort_index()
