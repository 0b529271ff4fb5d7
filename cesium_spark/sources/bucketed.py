"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of the per-series pipelines (featurize,
LOCF, as-of, metadata enrichment) is the shuffle on the series key.
Bucketing pays that shuffle ONCE at write time: both sides of a join
bucketed by the same key into the same bucket count join with ZERO
Exchange nodes — each task reads matching bucket files directly. The
same applies to groupBy on the bucket key (no re-shuffle before the
aggregation) when bucketed scans are enabled.

Spark implements this through the session catalog (`bucketBy` requires
`saveAsTable`); the helpers below wrap that so the rest of the engine
can stay path-based. sortBy on the in-bucket ordering additionally lets
the kernel's secondary sort start from sorted runs.

Rules of thumb encoded here:
  - bucket count is a join-compatibility contract: two tables co-join
    shuffle-free only with identical bucket counts on the join key
    (pick one per subject area and keep it; powers of two ease later
    splitting);
  - bucketed writes produce num_buckets files per write task — call
    with a sensibly-partitioned DataFrame (we repartition by the bucket
    key first so each task owns whole buckets and file counts stay at
    num_buckets, not tasks x buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and optionally in-bucket sorted)
    catalog table. `path` makes it an external table at that location."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    # one write task per bucket -> exactly num_buckets files, and the
    # write-side shuffle is the one shuffle this layout ever pays
    w = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket metadata
    only exists there — a plain parquet path read would lose it and
    reintroduce the shuffle)."""
    return spark.table(table)
