"""Featureset interchange with cesium's on-disk `.npz` container.

The engine's native featureset format is parquet (columnar, partitioned,
predicate-pushdown-able — the right call at scale); this module exists so
a cesium user can diff against, or migrate from, featuresets written by
the reference's ``save_featureset``/``load_featureset``
(/root/reference/cesium/featurize.py:417-497). The format: a compressed
npz whose ``features`` entry is the featureset TRANSPOSED to a numpy
record array with index fields (feature, channel) and one field per
series; object dtypes are widened to fixed-size unicode so nothing needs
pickling. Extra arrays (labels, predictions, ...) ride along as their own
npz entries.

An .npz is a single driver-side artifact by design — these helpers
collect/distribute through pandas and are for interchange, not for the
100 TB path (that's parquet).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "save_featureset_npz", "load_featureset_npz", "featureset_from_npz",
    "read_ts_npz", "featurize_npz_files",
]


def _to_unpickled_records(df: pd.DataFrame) -> np.ndarray:
    arr = df.to_records()
    dt_list = arr.dtype.descr
    for i, (name, dt) in enumerate(dt_list):
        if dt.endswith("O"):
            size = max((len(str(x)) for x in arr[name]), default=1)
            dt_list[i] = (name, f"U{max(size, 1)}")
    return arr.astype(dt_list)


def save_featureset_npz(fset, path: str, key_col: str = "conv_id", **extras) -> None:
    """Write a featureset (Spark DataFrame or pandas, one row per series,
    flat feature columns) as a cesium-compatible .npz.

    Flat columns map to channel '' — the same layout cesium produces for
    single-channel series; ``{feature}_{channel}`` flattened multichannel
    columns should be split by the caller if channel fidelity matters.
    ``extras`` (labels=..., preds=...) are stored as additional entries
    like the reference's kwargs.
    """
    if not isinstance(fset, pd.DataFrame):
        fset = fset.toPandas()
    pdf = fset.set_index(key_col)
    pdf.columns = pd.MultiIndex.from_tuples(
        [(c, "") for c in pdf.columns], names=["feature", "channel"]
    )
    payload: dict = {"features": _to_unpickled_records(pdf.T)}
    for k, v in extras.items():
        if isinstance(v, pd.DataFrame):
            payload[k] = _to_unpickled_records(v)
        else:
            v = np.asarray(v)
            if v.dtype == object:
                v = v.astype(str)
            payload[k] = v
    np.savez_compressed(path, **payload)


def load_featureset_npz(path: str) -> tuple[pd.DataFrame, dict]:
    """Read a cesium .npz featureset -> (pandas featureset indexed by
    series name with (feature, channel) MultiIndex columns, dict of extra
    arrays) — mirroring the reference loader's contract."""
    with np.load(path, allow_pickle=False) as z:
        data = dict(z)
    fset = pd.DataFrame.from_records(
        data.pop("features"), index=["feature", "channel"]
    ).T
    return fset, data


def featureset_from_npz(spark, path: str, key_col: str = "conv_id"):
    """Read a cesium .npz featureset into the engine's flat Spark layout:
    (key_col, feature[, {feature}_{channel} for multichannel])."""
    fset, _ = load_featureset_npz(path)
    flat = fset.copy()
    flat.columns = [
        f if ch in ("", None) else f"{f}_{ch}" for f, ch in fset.columns
    ]
    for c in flat.columns:
        try:
            flat[c] = pd.to_numeric(flat[c])
        except (ValueError, TypeError):
            pass  # non-numeric feature column stays as-is
    flat.insert(0, key_col, [str(i) for i in fset.index])
    return spark.createDataFrame(flat.reset_index(drop=True))


def read_ts_npz(path: str) -> dict:
    """Read one cesium ``TimeSeries.save()`` .npz file
    (/root/reference/cesium/time_series.py:282-317 writes; :85-118 reads):
    arrays time/measurement/error (or time0.., measurement0.. per
    channel), scalar name/label, parallel meta_feat_names/values.
    Returns {name, label, time, measurement, error, meta_features} with
    per-channel lists for multichannel files."""
    with np.load(path, allow_pickle=False) as z:
        data = dict(z)
    out: dict = {}
    for key in ("time", "measurement", "error"):
        if key in data:
            out[key] = data[key]
        else:
            n_ch = sum(1 for c in data if c.startswith(key))
            out[key] = [data[f"{key}{i}"] for i in range(n_ch)]
    out["name"] = str(data["name"].item()) if "name" in data else None
    out["label"] = data["label"].item() if "label" in data else None
    names = [str(x) for x in data.get("meta_feat_names", [])]
    vals = list(data.get("meta_feat_values", []))
    out["meta_features"] = dict(zip(names, vals))
    return out


def featurize_npz_files(spark, paths, features_to_use, **kwargs) -> pd.DataFrame:
    """cesium ``featurize_ts_files`` over TimeSeries .npz files
    (/root/reference/cesium/featurize.py:293-361): load each series file
    driver-side (they are per-series artifacts by construction) and
    featurize the batch through the distributed kernel via the public
    array API. Returns the pandas featureset indexed by series name."""
    from ..api import featurize_time_series

    series = [read_ts_npz(p) for p in paths]
    names = [
        s["name"] if s["name"] is not None else str(i)
        for i, s in enumerate(series)
    ]

    def _err_or_none(e):
        # a TimeSeries .npz with no error arrays reads back as [] / empty;
        # pass None so featurize_time_series applies the reference's
        # DEFAULT_ERROR_VALUE fill instead of choking on a (1, 0) array
        if e is None or len(e) == 0:
            return None
        return e

    errors = [_err_or_none(s["error"]) for s in series]
    return featurize_time_series(
        spark,
        [s["time"] for s in series],
        [s["measurement"] for s in series],
        errors if any(e is not None for e in errors) else None,
        features_to_use=features_to_use,
        names=names,
        **kwargs,
    )
