"""Sequence packing — the batch-materialization step between a cleaned
corpus and a training run (the GPT-style recipe: concatenate documents
in a fixed order and cut the stream into fixed-token-budget training
sequences; Brown et al. 2020 §2.3 "we pack multiple documents into a
single sequence", separated by EOT — Raffel et al. 2020 do the same for
T5). This operator emits the PLAN of that packing — which sequence each
document starts in and at what token offset — without materializing the
token stream, so a downstream writer can shard the actual concatenation
embarrassingly parallel.

Scale shape: a single global concatenation order would need one
corpus-wide running sum — a single-partition window, the classic scale
bug. Instead the corpus is sharded by a deterministic md5 bucket of the
id (``n_shards`` independent token streams — exactly how a multi-host
loader consumes data anyway), and the running sum is a window
PARTITIONED by shard: each shard sorts locally, no global order, no
single reducer. Shard count is the parallelism knob — at 100 TB you run
thousands of shards, each a few GB of token stream.

Determinism: shard and order are pure functions of (id, salt), so the
packing is growth-stable per shard-membership and fully SQL-replayable
(the oracle recomputes the window sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]

_BUCKETS = 10_000


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """(id, n_tokens, shard, seq_id, tok_offset) — the document's token
    count (whitespace tokens; swap in a real tokenizer's counts by
    passing a DataFrame that already has ``n_tokens``), its md5 shard,
    the index of the fixed-``budget`` training sequence its first token
    lands in within that shard, and the token offset inside that
    sequence. Documents longer than ``budget`` straddle sequence
    boundaries (the concatenate-and-cut semantics — no padding, no
    document-boundary alignment)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cols = df.columns
    if "n_tokens" in cols:
        base = df.select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"))
    else:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
        )
        n_tokens = F.when(
            F.col(text_col).isNull(), F.lit(0)
        ).otherwise(F.size(toks)).cast("long")
        base = df.select(id_col, n_tokens.alias("n_tokens"))
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    shard = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_shards))
    )
    sharded = base.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sharded.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(cum_before / budget).cast("long").alias("seq_id"),
        (cum_before % budget).cast("long").alias("tok_offset"),
    )
