"""Gap-based sessionization over event streams (batch form).

The canonical two-window construction: a session opens where the gap to
the previous event (per series, stable (ts, tiebreak) order) exceeds the
threshold; the session id is the running count of such openings. Both
windows share one partitioning on the series key, so the whole operator
is a single shuffle + two window passes, pure JVM. The streaming
counterpart (state across micro-batches) is
streaming.stream.streaming_sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel import ts_micros

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    gap_minutes: float = 30,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """Input rows + a ``session_id`` column (1-based per series)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    gap = ts_micros(F.col(ts_col)) - ts_micros(F.lag(ts_col).over(w))
    opens = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(opens).over(running))


def session_stats(
    df: DataFrame,
    gap_minutes: float = 30,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """Per-series session summary: session count, largest and mean
    session size — one extra aggregation over sessionize()."""
    sess = sessionize(df, gap_minutes, key_col, ts_col, tiebreak_col)
    per_sess = sess.groupBy(key_col, "session_id").agg(
        F.count("*").alias("sz")
    )
    return per_sess.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.max("sz").alias("max_session_events"),
        F.avg("sz").alias("avg_session_events"),
    )
