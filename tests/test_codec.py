"""Gorilla codec: bit-lossless roundtrips (FIXTURES.md F4 codec_vectors)
and the Spark compress/decompress operators incl. text-hash lineage."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.codec.gorilla import decode_block, encode_block
from cesium_spark.datagen import generate_transcripts
from cesium_spark.operators.compress import (
    compress_blocks,
    decompress_blocks,
    text_content_hash,
)

RNG = np.random.RandomState(7)

CODEC_VECTORS = {
    "constant_dt_constant_v": (np.arange(500) * 1000, np.full(500, 7.25)),
    "constant_dt_drift": (np.arange(500) * 60_000_000, 100 + np.cumsum(RNG.normal(0, 0.01, 500))),
    "irregular_random": (np.sort(RNG.randint(0, 10**12, 500)), RNG.normal(0, 1e6, 500)),
    "repeated_values": (np.arange(100) * 10, np.repeat([1.5, -2.5, 1.5, 0.0], 25)),
    "specials": (np.arange(8), np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324, 1e308, np.nan])),
    "single_point": (np.array([42]), np.array([3.14159])),
    "empty": (np.zeros(0, np.int64), np.zeros(0)),
    "duplicate_ts": (np.array([5, 5, 5, 9]), np.array([1.0, 2.0, 2.0, 3.0])),
}


@pytest.mark.parametrize("name", sorted(CODEC_VECTORS))
def test_roundtrip_bit_exact(name):
    ts, v = CODEC_VECTORS[name]
    ts2, v2 = decode_block(encode_block(ts, v))
    np.testing.assert_array_equal(ts.astype(np.int64), ts2)
    # float comparison at the bit level (NaN payloads, -0.0 preserved)
    np.testing.assert_array_equal(
        np.asarray(v, np.float64).view(np.uint64), v2.view(np.uint64)
    )


def test_compression_beats_raw_on_regular_series():
    ts, v = CODEC_VECTORS["constant_dt_constant_v"]
    assert len(encode_block(ts, v)) < 0.05 * len(ts) * 16


def test_spark_compress_decompress_roundtrip(spark):
    df = generate_transcripts(spark, n_convs=12, seed=11, max_turns=2000).cache()
    blocks = compress_blocks(df, "1h").cache()
    back = decompress_blocks(blocks)

    raw = (
        df.select(
            "conv_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.length("text").cast("double").alias("value"),
        )
        .toPandas()
        .sort_values(["conv_id", "us", "value"])
        .reset_index(drop=True)
    )
    got = (
        back.select("conv_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "value")
        .toPandas()
        .sort_values(["conv_id", "us", "value"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(raw, got)  # every point survives exactly

    # block accounting
    b = blocks.toPandas()
    assert (b["n_points"] > 0).all()
    assert b["n_points"].sum() == len(raw)
    assert (b["block_bytes"] < b["raw_bytes"] + 64).all()


def test_text_hash_lineage(spark):
    df = generate_transcripts(spark, n_convs=5, seed=11, max_turns=500).cache()
    blocks = compress_blocks(df, "1h").toPandas().set_index(["conv_id", "window_start"])
    local = df.toPandas()
    local["window_start"] = local["ts"].dt.floor("h")
    for (cid, ws), g in local.groupby(["conv_id", "window_start"]):
        g = g.sort_values(["ts", "turn_idx"], kind="stable")
        assert blocks.loc[(cid, ws), "text_md5"] == text_content_hash(g["text"])


def test_text_hash_detects_mutation():
    assert text_content_hash(["ab", "c"]) != text_content_hash(["a", "bc"])
    assert text_content_hash(["ab", "c"]) != text_content_hash(["c", "ab"])
