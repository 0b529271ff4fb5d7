"""Behavioral-sequence similarity: blocked Levenshtein over per-series
event-type strings.

"Which actors behave most alike?" as an edit-distance question: each
series' first `cap` events (by (ts, tiebreak)) encode to a compact
string — one character per event, the event type's registered symbol —
and similarity is 1 - levenshtein / max(len). Character-level encoding
keeps the distance JVM-evaluable (`F.levenshtein`, whole-stage codegen)
and engine-portable (DuckDB `levenshtein()` agrees exactly).

All-pairs edit distance is quadratic, so the operator blocks first —
the standard length-band + prefix blocking of record-linkage systems
(Fellegi-Sunter era; see also Papadakis et al. 2020 survey on blocking):
two sequences can only beat a similarity floor if their lengths are
within a band and (cheaply) share a first symbol, so candidate pairs
are an equi-join on (length bucket, first char) — AQE-splittable,
no cartesian. Levenshtein cost per pair is bounded by cap².

Scale: the encode pass is the kernel idiom (one exchange + partition
sort via collect_list over a sorted window — here a groupBy over the
pre-aggregated per-series string built with ONE window pass); blocks
bound the join fan-out; the final top-k is TakeOrderedAndProject
(no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["encode_sequences", "sequence_similarity_topk"]


def encode_sequences(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    cap: int = 40,
) -> DataFrame:
    """Per-series event-type string: first `cap` events in time order,
    one character each (the type's first character — callers with
    colliding type initials should pre-map `type_col`).

    Returns (key, seq, seq_len).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    ranked = df.select(
        F.col(key_col),
        F.substring(F.col(type_col), 1, 1).alias("_c"),
        F.row_number().over(w).alias("_rn"),
    ).where(F.col("_rn") <= cap)
    return (
        ranked.groupBy(key_col)
        .agg(
            F.concat_ws(
                "", F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "_c"))),
                    lambda s: s["_c"],
                )
            ).alias("seq")
        )
        .withColumn("seq_len", F.length("seq"))
    )


def sequence_similarity_topk(
    df: DataFrame,
    k: int = 50,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    cap: int = 40,
    band: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k most-similar series pairs by normalized edit similarity,
    searched within (length-bucket, first-char) blocks.

    A pair is a candidate iff floor(len/band) matches AND the first
    characters match (documented recall tradeoff — the blocks are the
    scale device; widen `band` to trade cost for recall). Returns
    (key_a, key_b, len_a, len_b, edit_dist, similarity) ordered by
    (similarity desc, key_a, key_b), limited to k.
    """
    seqs = encode_sequences(df, key_col, ts_col, type_col, tiebreak_col, cap)
    blocked = seqs.select(
        F.col(key_col).alias("_k"),
        "seq", "seq_len",
        F.floor(F.col("seq_len") / band).alias("_lb"),
        F.substring("seq", 1, 1).alias("_fc"),
    )
    a = blocked.select(
        F.col("_k").alias("key_a"), F.col("seq").alias("seq_a"),
        F.col("seq_len").alias("len_a"), "_lb", "_fc",
    )
    b = blocked.select(
        F.col("_k").alias("key_b"), F.col("seq").alias("seq_b"),
        F.col("seq_len").alias("len_b"), "_lb", "_fc",
    )
    pairs = (
        a.join(b, ["_lb", "_fc"])
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist",
                    F.levenshtein("seq_a", "seq_b").cast("long"))
        .withColumn(
            "similarity",
            F.round(
                1.0 - F.col("edit_dist")
                / F.greatest("len_a", "len_b").cast("double")
                + F.lit(1e-9),
                round_digits,
            ),
        )
    )
    return (
        pairs.select("key_a", "key_b",
                     F.col("len_a").cast("long").alias("len_a"),
                     F.col("len_b").cast("long").alias("len_b"),
                     "edit_dist", "similarity")
        .orderBy(F.desc("similarity"), "key_a", "key_b")
        .limit(k)
    )
