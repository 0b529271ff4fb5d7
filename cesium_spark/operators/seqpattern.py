"""MATCH_RECOGNIZE-style event-sequence pattern matching.

SQL:2016 row-pattern recognition (the MATCH_RECOGNIZE clause in
Flink/Trino/Oracle) detects regex-shaped patterns over ordered event
streams. Spark has no MATCH_RECOGNIZE; this operator re-expresses the
bounded-quantifier subset (each match has a finite maximum length) as
pure JVM relational algebra:

1. map each event type to one symbol character (a CASE projection),
2. per actor, fold the time-ordered symbols into ONE string with
   ``array_join(transform(array_sort(collect_list(struct(ts, tb,
   sym)))))`` — a single hash aggregate, so exactly one Exchange on
   the actor key and NO window sort,
3. count leftmost non-overlapping regex matches with
   ``regexp_extract_all`` (Java regex; RE2 in the DuckDB oracle —
   identical semantics for the anchored-quantifier patterns this
   operator accepts, pinned by tests on the boundary cases).

Scale: the folded string is one actor's event count in bytes — the
same per-actor memory class as every sessionization/gaps-and-islands
operator here; hot actors are bounded by activity, not corpus size.
For unbounded streams use the streaming twin
(streaming/stream.py streaming_pattern_counts), whose state is the
match count plus at most (max_match_len - 1) unconsumed trailing
symbols — the truncation is exact because no future match can start
more than max_match_len - 1 symbols before the batch boundary and no
match ends inside the unconsumed region (it would have been consumed).

Default pattern over the synthetic events table: ``E{1,8}P`` — a
burst of 1-8 errors resolved by a purchase ("retry then convert"),
the transcript analogue of tool-failure loops ending in success.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["DEFAULT_SYMBOLS", "symbol_column", "sequence_pattern_counts"]

# one char per event type of the synthetic events table
DEFAULT_SYMBOLS = {
    "click": "C", "view": "V", "error": "E", "purchase": "P", "signup": "S",
}


def symbol_column(type_col: str = "event_type",
                  symbols: dict[str, str] = DEFAULT_SYMBOLS) -> Column:
    """CASE-mapping an event type to its single-char symbol ('?' for
    unmapped types so the regex can never accidentally match them)."""
    c = F
    expr = None
    for k, v in symbols.items():
        cond = F.col(type_col) == k
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit("?"))


def sequence_pattern_counts(
    df: DataFrame,
    pattern: str = "E{1,8}P",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    symbols: dict[str, str] = DEFAULT_SYMBOLS,
) -> DataFrame:
    """Per-actor pattern-match counts: ``seq_len`` (events), ``n_matches``
    (leftmost non-overlapping occurrences of `pattern` over the
    (ts, tiebreak)-ordered symbol string) and ``first_match`` (the first
    matched substring, '' when none). One Exchange; no Python, no
    Window (plan-tested)."""
    sym = symbol_column(type_col, symbols)
    folded = (
        df.select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("tb"),
                sym.alias("s"),
            ).alias("ev"),
        )
        .groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("ev")), lambda x: x["s"]),
                "",
            ).alias("seq")
        )
    )
    matches = F.regexp_extract_all(F.col("seq"), F.lit(pattern), 0)
    return folded.select(
        F.col(key_col),
        F.length("seq").cast("long").alias("seq_len"),
        F.size(matches).cast("long").alias("n_matches"),
        F.coalesce(F.try_element_at(matches, F.lit(1)), F.lit(""))
        .alias("first_match"),
    )
