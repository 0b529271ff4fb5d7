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

__all__ = ["save_featureset_npz", "load_featureset_npz", "featureset_from_npz"]


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
