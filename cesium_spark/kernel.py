"""Spark featurization kernel: cesium's per-series feature evaluation as a
vectorized ``groupBy(...).applyInPandas(...)`` over a long-format
transcript/event DataFrame.

Parallelism model (mirrors the reference's design, SURVEY.md §3.3-3.4):
one Spark task group = one (series [, window]) = one serial numpy kernel
invocation; Spark supplies cross-series parallelism, Arrow supplies
zero-copy JVM->pandas transfer. No per-row Python anywhere.

Determinism: within each group rows are stably sorted by
(t, tiebreak) before any feature is computed — the stable
(conv_id, turn_idx) ordering the north rule requires (the reference sorts
by t alone with a non-stable quicksort; we document the stronger
tie-broken ordering and use it everywhere).

Scale notes (100 TB):
  - the groupBy shuffles once on the group key; tier windows bound group
    size, so no group outgrows one task even for hot conversations;
  - for whole-conversation featurization of extreme series, use
    operators.aggstate (mergeable two-phase aggregation) for the mergeable
    subset instead of this kernel;
  - only the projected columns (key, t, m, e, tiebreak) reach the shuffle:
    we select them explicitly so Parquet scans prune everything else.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

from .features.registry import compute_features

DEFAULT_ERROR_VALUE = 1e-4  # cesium's DEFAULT_ERROR_VALUE (time_series.py:10)
SECONDS_PER_DAY = 86400.0

__all__ = ["featurize", "make_kernel", "ts_micros", "DEFAULT_ERROR_VALUE", "SECONDS_PER_DAY"]


def ts_micros(col: Column) -> Column:
    """unix microseconds of a timestamp column; tolerates TIMESTAMP_NTZ
    inputs (cast is value-identity under the engine's fixed UTC session
    timezone, see session.py)."""
    return F.unix_micros(col.cast("timestamp"))


def make_kernel(
    features: Sequence[str],
    key_cols: Sequence[str],
    custom_functions: Mapping[str, Callable] | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Build the applyInPandas function: one output row per group with the
    group keys followed by one float64 column per feature.

    Expects input columns: ``key_cols + ['t', 'm', 'e', '_ord']`` where t is
    float64 in the kernel's time unit and _ord is the stable tiebreaker.
    """
    features = list(features)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "_ord"], kind="stable")
        t = pdf["t"].to_numpy(dtype=np.float64)
        m = pdf["m"].to_numpy(dtype=np.float64)
        e = pdf["e"].to_numpy(dtype=np.float64)
        vals = compute_features(t, m, e, features, custom_functions=custom_functions)
        row = {k: [pdf[k].iloc[0]] for k in key_cols}
        row.update({name: [vals[name]] for name in features})
        return pd.DataFrame(row)

    return _kernel


def featurize(
    df: DataFrame,
    features: Sequence[str],
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
    m: Column | str | None = None,
    e: Column | str | None = None,
    t: Column | str | None = None,
    window: str | None = None,
    time_unit_seconds: float = SECONDS_PER_DAY,
    custom_functions: Mapping[str, Callable] | None = None,
) -> DataFrame:
    """Featurize each (series [, tumbling window]) group of `df`.

    Parameters
    ----------
    m : measurement channel; default ``length(text)`` cast to double (the
        transcript convention from BASELINE.json input_hint).
    e : per-point error; default constant DEFAULT_ERROR_VALUE.
    t : time axis as float64; default ``unix_seconds(ts)/time_unit_seconds``
        (days, so cad_probs_<k> keep their "k minutes" meaning — the golden
        astronomy vectors use days too).
    window : tumbling tier width, e.g. "1 minute"/"1 hour"/"1 day"; when
        set, output has a window_start timestamp column and groups are
        (key, window).
    """
    features = list(features)
    m_col = F.col(m) if isinstance(m, str) else m
    if m_col is None:
        m_col = F.length(F.col("text")).cast("double")
    e_col = F.col(e) if isinstance(e, str) else e
    if e_col is None:
        e_col = F.lit(DEFAULT_ERROR_VALUE).cast("double")
    t_col = F.col(t) if isinstance(t, str) else t
    if t_col is None:
        # integer microseconds -> double -> one division: bit-deterministic
        # (us < 2^52 is exactly representable in float64)
        t_col = ts_micros(F.col(ts_col)).cast("double") / F.lit(time_unit_seconds * 1e6)

    cols = [
        F.col(key_col),
        t_col.alias("t"),
        m_col.alias("m"),
        e_col.alias("e"),
        F.col(tiebreak_col).cast("long").alias("_ord"),
    ]
    key_cols = [key_col]
    if window is not None:
        cols.append(F.window(F.col(ts_col), window).start.alias("window_start"))
        key_cols = [key_col, "window_start"]

    narrow = df.select(*cols)

    key_fields = [narrow.schema[k] for k in [key_col]]
    out_fields = list(key_fields)
    if window is not None:
        out_fields.append(StructField("window_start", TimestampType(), True))
    out_fields += [StructField(name, DoubleType(), True) for name in features]
    schema = StructType(out_fields)

    kernel = make_kernel(features, key_cols, custom_functions)
    return narrow.groupBy(*key_cols).applyInPandas(kernel, schema=schema)
