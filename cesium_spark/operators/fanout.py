"""Scan fan-out: give compute-heavy map stages at least core-count
parallelism when the input file layout provides fewer splits.

The problem (guide §2.5 "input skew", §6 "input split size"): Parquet
splits at row-group boundaries, so a table written as one file with one
row group scans as ONE task no matter how many cores the cluster has.
Every operator whose expensive work sits BEFORE its first exchange
(shingle explode + minhash digests, per-document regex profiles,
vector math on embedding arrays) then runs that work on a single core —
at the bench's sf inputs this serialized 10-15 s of hashing that the
other 31 cores could have shared.

``fan_out`` round-robin repartitions ONLY when the source parallelism is
below the session's default parallelism (i.e. the scan cannot fill the
cluster). At production scale a 100 TB table has thousands of row
groups, the guard short-circuits, and NO extra exchange is added — the
helper is a local-layout fix, not a tuned constant. The repartition is
deterministic (Spark sorts before round-robin repartition by default,
SPARK-23207) and every caller feeds order-insensitive aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` to at least the session's default parallelism,
    or return it unchanged when its scan already provides that many
    splits (the 100 TB case — no plan change)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # un-plannable input: leave untouched
        return df
    if n >= target:
        return df
    return df.repartition(target)
