"""Structured Streaming rollup: the tier pipeline as a continuous query.

The batch-incremental path (operators/incremental.py + lineage
checkpoints) is the engine's primary ingestion mode per the north rule;
this module additionally exposes the same tier semantics as a native
Structured Streaming job for deployments that want push-based ingestion:

  readStream (file/kafka source) -> event-time tumbling window aggregates
  with a watermark for late data -> append-mode sink.

Only mergeable aggregates run in the streaming path (Spark's streaming
aggregation state is exactly our partial-state algebra); non-mergeable
features are produced by the batch kernel over closed windows downstream
(the `complete/dirty` flag pattern from SURVEY.md §7 risk 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import SECONDS_PER_DAY, ts_micros
from .rollup_schema import STREAM_ROLLUP_COLUMNS

__all__ = ["streaming_rollup", "start_file_stream"]


def streaming_rollup(
    stream_df: DataFrame,
    tier: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    m=None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window mergeable aggregates over a streaming
    DataFrame; schema matches rollup_sql's output plus window_end."""
    m_col = F.col(m) if isinstance(m, str) else m
    if m_col is None:
        m_col = F.length(F.col("text")).cast("double")
    t_days = ts_micros(F.col(ts_col)).cast("double") / F.lit(SECONDS_PER_DAY * 1e6)
    w = F.window(F.col(ts_col), tier)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(F.col(key_col), F.col(ts_col), m_col.alias("m"), t_days.alias("t"))
        .groupBy(key_col, w.alias("w"))
        .agg(
            F.count("*").cast("double").alias("n_epochs"),
            F.avg("m").alias("mean"),
            F.min("m").alias("minimum"),
            F.max("m").alias("maximum"),
            ((F.max("m") - F.min("m")) / 2.0).alias("amplitude"),
            F.stddev_pop("m").alias("std"),
            (F.max("t") - F.min("t")).alias("total_time"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *STREAM_ROLLUP_COLUMNS,
        )
    )


def start_file_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    tier: str = "1 hour",
    watermark: str = "2 hours",
    **kwargs,
):
    """File-source streaming job: new parquet files under `input_dir`
    roll into append-mode parquet tier output. Returns the StreamingQuery
    (caller awaits/stops)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = streaming_rollup(src, tier=tier, watermark=watermark, **kwargs)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
