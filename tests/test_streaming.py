"""Structured Streaming rollup: file-source stream equals the batch SQL
rollup on the same data (closed windows only), and late-data watermark
semantics hold across incremental file arrivals."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.datagen import generate_transcripts
from cesium_spark.operators.rollup import rollup_sql
from cesium_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from cesium_spark.streaming.stream import start_file_stream


def test_streaming_rollup_matches_batch(spark, tmp_path):
    df = generate_transcripts(spark, n_convs=10, seed=13, max_turns=2000).cache()
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # stage the data as two "arriving" files
    a = df.filter(F.col("turn_idx") % 2 == 0)
    b = df.subtract(a)
    a.write.mode("overwrite").parquet(in_dir)
    b.write.mode("append").parquet(in_dir)

    q = start_file_stream(
        spark, in_dir, out_dir, ckpt, TRANSCRIPT_SCHEMA, tier="1 hour",
        watermark="0 seconds",
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .drop("window_end")
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    want = (
        rollup_sql(df, "1h")
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    # append mode emits only windows closed by the watermark: with
    # watermark 0s, every window before the max event time closes.
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    want = want[want["window_start"] < pd.Timestamp(max_ts).floor("h")] \
        .reset_index(drop=True)
    got = got[got["window_start"] < pd.Timestamp(max_ts).floor("h")] \
        .reset_index(drop=True)
    want = want.drop(columns=["avgt"])
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, rtol=1e-9
    )
