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
    m=None,
    e=None,
    features_to_use=(),
    custom_script_path=None,
    custom_functions=None,
    raise_exceptions: bool = True,
) -> dict:
    """One in-memory series -> {feature: value}. Accepts either raw
    (t, m[, e]) arrays or a TimeSeries object as the first argument
    (the reference's featurize_single_ts shape, featurize.py:25-99);
    multichannel TimeSeries return flat ``{feature}_{channel}`` keys
    (the engine's flattening of cesium's (feature, channel) index).
    ``custom_script_path`` is accepted for drop-in signature parity and
    ignored, exactly as the reference's core does (featurize.py:28); it
    is ordered BEFORE custom_functions to match the reference, and the
    TimeSeries branch additionally accepts the reference's fully
    positional call shape ``(ts, features, script_path, funcs)`` —
    there the 2nd/3rd/4th positions land on m/e/features_to_use and are
    re-bound to features/script-path/custom-functions."""
    from .time_series import TimeSeries

    if isinstance(t, TimeSeries):
        ts = t
        # reference fully-positional shape (ts, features, script_path,
        # funcs): the 4th positional lands here as features_to_use — a
        # dict (the custom_functions contract) never names features, so
        # re-bind it; the 3rd positional (script path) lands on `e`,
        # which this branch ignores exactly like the reference core
        if custom_functions is None and isinstance(features_to_use, dict):
            custom_functions = features_to_use
            features_to_use = ()
        features_to_use = list(features_to_use or m or ())
        out: dict = {}
        chans = list(ts.channels())
        for ch, (tc, mc, ec) in enumerate(chans):
            vals = compute_features(
                np.asarray(tc, dtype=np.float64),
                np.asarray(mc, dtype=np.float64),
                np.asarray(ec, dtype=np.float64),
                list(features_to_use),
                custom_functions=custom_functions,
                raise_exceptions=raise_exceptions,
            )
            if len(chans) == 1:
                out.update(vals)
            else:
                out.update({f"{k}_{ch}": v for k, v in vals.items()})
        out.update(ts.meta_features)
        return out
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


from .time_series import DEFAULT_MAX_TIME  # noqa: E402  (single source)


def _is_single_series(values) -> bool:
    """Reference shape rules (featurize.py:262-266): a 1-d array / list
    of scalars is one single-channel series; a 2-d ndarray is one
    multichannel series; any other list/tuple is a LIST of series."""
    if isinstance(values, np.ndarray):
        return values.ndim <= 2
    first = values[0]
    return not isinstance(first, (list, tuple, np.ndarray))


def _channel_arrays(x):
    """One series entry -> list of per-channel 1-d float arrays.
    Accepts (n,) array / list of scalars, (p, n) array, or a list of
    per-channel arrays (possibly RAGGED — different n per channel, the
    reference's 'list of lists' form). None passes through."""
    if x is None:
        return None
    if isinstance(x, np.ndarray) and x.ndim == 2:
        return [np.asarray(x[i], dtype=np.float64) for i in range(x.shape[0])]
    if (
        isinstance(x, (list, tuple))
        and len(x)
        and isinstance(x[0], (list, tuple, np.ndarray))
    ):
        return [np.asarray(c, dtype=np.float64) for c in x]
    return [np.asarray(x, dtype=np.float64)]


def featurize_time_series(
    spark,
    times,
    values,
    errors=None,
    features_to_use=(),
    meta_features=None,
    names=None,
    custom_script_path=None,
    custom_functions=None,
    raise_exceptions: bool = True,
) -> pd.DataFrame:
    # custom_script_path: accepted-and-ignored for drop-in parity with
    # the reference signature (featurize.py:155, same parameter ORDER —
    # positional callers bind identically) — its core does the same
    features = list(features_to_use)
    if _is_single_series(values):
        values = [values]
        times = None if times is None else [times]
        errors = None if errors is None else [errors]
    n_series = len(values)
    if times is not None and len(times) != n_series:
        raise ValueError("times/values series counts differ")
    if errors is not None and len(errors) != n_series:
        raise ValueError("errors/values series counts differ")
    names = (
        [str(n) for n in names]
        if names is not None
        else [str(i) for i in range(n_series)]
    )

    # columnar assembly: one concat of per-channel frames, never a
    # per-point Python tuple loop (Arrow takes the whole block at once)
    frames = []
    n_channels = 1
    for si in range(n_series):
        m_ch = _channel_arrays(values[si])
        t_ch = _channel_arrays(None if times is None else times[si])
        e_ch = _channel_arrays(None if errors is None else errors[si])
        p = len(m_ch)
        n_channels = max(n_channels, p)
        for label, x_ch in (("times", t_ch), ("errors", e_ch)):
            if x_ch is not None and len(x_ch) not in (1, p):
                raise ValueError(
                    f"series {names[si]}: {label} has {len(x_ch)} channels "
                    f"but values has {p} (must match or be shared 1-d)"
                )
        # cesium broadcasts shared 1-d t/e across channels
        if t_ch is not None and len(t_ch) == 1 and p > 1:
            t_ch = t_ch * p
        if e_ch is not None and len(e_ch) == 1 and p > 1:
            e_ch = e_ch * p
        for ch in range(p):
            mv = m_ch[ch]
            n = len(mv)
            # reference defaults (featurize.py:236-260 / time_series.py):
            # missing times -> linspace(0, DEFAULT_MAX_TIME) per channel,
            # missing errors -> DEFAULT_ERROR_VALUE fill
            tv = (
                np.linspace(0.0, DEFAULT_MAX_TIME, n)
                if t_ch is None
                else t_ch[ch]
            )
            ev = (
                np.full(n, DEFAULT_ERROR_VALUE)
                if e_ch is None
                else e_ch[ch]
            )
            if len(tv) != n or len(ev) != n:
                raise ValueError(
                    f"series {names[si]} channel {ch}: t/m/e lengths differ"
                )
            frames.append(
                pd.DataFrame(
                    {
                        "series": np.repeat(
                            np.array(names[si], dtype=object), n
                        ),
                        "channel": np.full(n, ch, dtype=np.int64),
                        "idx": np.arange(n, dtype=np.int64),
                        "t": tv.astype(np.float64, copy=False),
                        "m": mv.astype(np.float64, copy=False),
                        "e": ev.astype(np.float64, copy=False),
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

    # meta_features (reference featurize.py:271-274): dict/Series
    # broadcast to every series, DataFrame one row per series
    # (positional), attached as plain columns of the featureset
    if meta_features is not None and len(meta_features):
        if isinstance(meta_features, pd.Series):
            meta_features = meta_features.to_dict()
        if isinstance(meta_features, dict):
            meta = pd.DataFrame(meta_features, index=names)
        else:
            if len(meta_features) != n_series:
                raise ValueError("meta_features rows != number of series")
            meta = meta_features.copy()
            meta.index = names
        out = out.join(meta)
    return out.sort_index()
