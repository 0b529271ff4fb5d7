"""Range (interval) join: points joined to the time intervals containing
them, per series key — without the cartesian a naive theta-join plans.

Strategy: bucket both sides on the tier grid. Each interval explodes to
the tier buckets it overlaps (bounded fan-out: ceil(interval/tier) + 1);
each point lands in exactly one bucket, so every qualifying (point,
interval) pair is generated exactly once by the (key, bucket) EQUI-join
and verified with the range predicate. This is the standard interval-
bucketing rewrite (Spark has no native range-join optimization without
vendor extensions); pick `tier` near the typical interval length — too
coarse inflates candidates per bucket, too fine inflates the interval
explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    tier: str = "1h",
) -> DataFrame:
    """Pairs (point row, interval row) where point.ts is in
    [start, end) and keys match. Output: all point columns + all interval
    columns except the key (half-open end, the tier-window convention).
    Degenerate intervals (end <= start) are empty under half-open
    semantics and match no points."""
    step = _TIER_SECONDS[tier]
    p_bucket = F.date_trunc(
        {"1m": "minute", "1h": "hour", "1d": "day"}[tier], F.col(ts_col)
    )
    i_start = F.date_trunc(
        {"1m": "minute", "1h": "hour", "1d": "day"}[tier], F.col(start_col)
    )
    # buckets the interval overlaps: sequence is inclusive, and end is
    # exclusive, so stop at the bucket containing (end - 1us)
    i_stop = F.date_trunc(
        {"1m": "minute", "1h": "hour", "1d": "day"}[tier],
        F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"),
    )
    # degenerate intervals (end <= start) contain no point under the
    # half-open semantics — drop them up front, both because that is the
    # correct result and because F.sequence(start, stop, +step) raises at
    # runtime when stop < start (one empty interval row would otherwise
    # crash the whole job)
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    ivl = intervals.select(
        F.col(key_col).alias("_k"),
        F.explode(
            F.sequence(i_start, i_stop, F.expr(f"INTERVAL {step} SECONDS"))
        ).alias("_bucket"),
        *[F.col(c) for c in intervals.columns if c != key_col],
    )
    pts = points.select(
        F.col(key_col), p_bucket.alias("_bucket"),
        *[F.col(c) for c in points.columns if c != key_col],
    )
    return (
        pts.join(ivl, (pts[key_col] == ivl["_k"]) & (pts["_bucket"] == ivl["_bucket"]))
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_k", "_bucket")
    )
