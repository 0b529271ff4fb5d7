"""Readers/normalizers for the engine's inputs.

- read_transcripts: parquet/snapshot-table scan of the canonical
  (conv_id, turn_idx, role, text, tool, ts) schema with optional tier
  horizon pushdown (ts-range filters reach the parquet scan).
- read_ts_csv: the reference's CSV time-series format (parse_ts_data,
  /root/reference/cesium/data_management.py:14-58): rows of t[,m[,e]];
  missing error column filled with cesium's DEFAULT_ERROR_VALUE, missing
  measurement handled like the reference (single column = measurements at
  implicit uniform times is NOT supported there either — two-column data
  is (t, m)).
- normalize: enforce schema/types + the engine's stable ordering columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..kernel import DEFAULT_ERROR_VALUE

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcripts(
    spark: SparkSession,
    path: str,
    horizon: tuple[str, str] | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if horizon is not None:
        df = df.filter(F.col("ts").between(*horizon))  # pushed to the scan
    return df


def read_ts_csv(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """Reference-format series CSV -> (idx, t, m, e) DataFrame with the
    default-error fill."""
    raw = spark.read.csv(path, sep=sep, inferSchema=True)
    cols = raw.columns
    if len(cols) >= 3:
        df = raw.select(
            F.col(cols[0]).cast("double").alias("t"),
            F.col(cols[1]).cast("double").alias("m"),
            F.coalesce(F.col(cols[2]).cast("double"),
                       F.lit(DEFAULT_ERROR_VALUE)).alias("e"),
        )
    elif len(cols) == 2:
        df = raw.select(
            F.col(cols[0]).cast("double").alias("t"),
            F.col(cols[1]).cast("double").alias("m"),
            F.lit(DEFAULT_ERROR_VALUE).alias("e"),
        )
    else:
        raise ValueError("expected 2 or 3 CSV columns (t, m[, e])")
    return df.withColumn("idx", F.row_number().over(Window.orderBy("t")) - 1)


def featurize_csv_series(
    spark: SparkSession,
    paths: dict[str, str],
    features,
    **kwargs,
) -> DataFrame:
    """cesium's featurize_ts_files equivalent: {series_name: csv_path} ->
    one featureset row per series (reference featurize.py:293-361 —
    per-path load + per-series featurization + assembly; here each file
    becomes one group of a union DataFrame and the kernel runs once)."""
    from pyspark.sql import functions as F

    from ..kernel import featurize

    parts = []
    for name, path in sorted(paths.items()):
        df = read_ts_csv(spark, path).withColumn("series", F.lit(name))
        parts.append(df)
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return featurize(
        allrows, features,
        key_col="series", tiebreak_col="idx",
        t="t", m="m", e="e", ts_col="t",
        **kwargs,
    )
