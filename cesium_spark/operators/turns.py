"""Conversation-turn analytics over transcript-shaped streams.

The graft's payload is multi-turn agent transcripts ``(conv_id,
turn_idx, role, text, tool, ts)``; these operators compute the
turn-taking diagnostics an agent-transcript pipeline monitors: how
often the speaker alternates (a stuck tool loop shows as a low
alternation rate — the batch cousin of `operators/runs.py`), and how
long each role takes to answer each other role (user->assistant reply
latency is the serving-side SLO; assistant->tool and tool->assistant
latency separate model time from tool time).

Any (key, role, ts) stream works — the driver queries run them over
the events table with ``role = event_type`` — and the transcript
kernel runs them over real ``generate_transcripts`` output with
``role`` proper (tests pin both shapes).

Scale shape: ONE Exchange on the conversation key feeding a fused
lag window (conversations are hash-partitioned; the per-key windows
are partition-local after the shuffle), then partial-aggregable
groupBys. Gap arithmetic is exact integer microseconds
(`unix_micros`, DuckDB `epoch_us`) divided once into double seconds,
so both engines see bit-identical doubles. Reply-latency percentiles
sort only the per-pair gap relation (|roles|^2 groups), never the
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["turn_stats", "reply_latency"]


def _r(col, digits: int = 6):
    # shared cross-engine rounding idiom: +1e-9 absorbs one-ulp
    # summation-order differences before the round
    return F.round(col + F.lit(1e-9), digits)


def _lagged(
    df: DataFrame, key_col: str, role_col: str, ts_col: str, id_col: str
) -> DataFrame:
    """(key, role, prev_role, gap_s) with one window over the
    (ts, id)-ordered per-key stream; gap_s is NULL on each key's first
    turn. The composite (ts, id) order key makes the lag deterministic
    under timestamp ties — the engine-portability rule every ordered
    operator in this repo follows."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return df.select(
        F.col(key_col),
        F.col(role_col).alias("role"),
        F.lag(role_col).over(w).alias("prev_role"),
        ((us - F.lag(us).over(w)) / F.lit(1e6)).alias("gap_s"),
        us.alias("_us"),
    )


def turn_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    id_col: str = "turn_idx",
    round_digits: int = 6,
) -> DataFrame:
    """Per-conversation turn-taking profile:

    - ``n_turns``, ``n_roles`` — size and speaker diversity;
    - ``n_switches`` / ``alternation`` — consecutive-turn speaker
      changes and their rate over the n_turns-1 adjacent pairs (NULL
      for single-turn conversations; 0 alternation = one speaker
      monologuing, the loop signature);
    - ``mean_gap_s`` / ``max_gap_s`` — inter-turn latency profile;
    - ``duration_s`` — first-to-last span.

    One Exchange (the lag window's hash partitioning) reused by the
    groupBy — the aggregate is partial-aggregable on the same key, so
    Catalyst plans no second shuffle."""
    lag = _lagged(df, key_col, role_col, ts_col, id_col)
    switch = (
        F.col("prev_role").isNotNull() & (F.col("prev_role") != F.col("role"))
    ).cast("long")
    n = F.count(F.lit(1))
    agg = lag.groupBy(key_col).agg(
        n.alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum(switch).alias("n_switches"),
        F.mean("gap_s").alias("_mg"),
        F.max("gap_s").alias("_xg"),
        ((F.max("_us") - F.min("_us")) / F.lit(1e6)).alias("_dur"),
    )
    one = F.col("n_turns") > 1
    return agg.select(
        key_col,
        "n_turns",
        "n_roles",
        "n_switches",
        F.when(one, _r(F.col("n_switches") / (F.col("n_turns") - 1), round_digits))
        .alias("alternation"),
        F.when(one, _r(F.col("_mg"), round_digits)).alias("mean_gap_s"),
        F.when(one, _r(F.col("_xg"), round_digits)).alias("max_gap_s"),
        _r(F.col("_dur"), round_digits).alias("duration_s"),
    )


def reply_latency(
    df: DataFrame,
    key_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    id_col: str = "turn_idx",
    round_digits: int = 6,
) -> DataFrame:
    """Role-pair reply-latency matrix: for every adjacent
    (prev_role -> role) turn pair within a conversation, the count,
    mean, p50 and p95 of the gap in seconds — user->assistant is the
    answer-latency SLO, assistant->tool vs tool->assistant separates
    model time from tool time.

    The heavy stream sees one Exchange (the lag window) + one
    partial-aggregable groupBy onto the |roles|^2 pair relation; the
    exact percentiles sort gaps WITHIN each pair group (the
    value_percentiles trade — exact beats t-digest while per-group
    data fits a task; both engines use the same 1+q*(n-1) linear
    interpolation on identical doubles)."""
    lag = _lagged(df, key_col, role_col, ts_col, id_col)
    pairs = lag.filter(F.col("prev_role").isNotNull())
    return (
        pairs.groupBy(
            F.col("prev_role").alias("from_role"), F.col("role").alias("to_role")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.mean("gap_s"), round_digits).alias("mean_gap_s"),
            _r(F.expr("percentile(gap_s, 0.5)"), round_digits).alias("p50_gap_s"),
            _r(F.expr("percentile(gap_s, 0.95)"), round_digits).alias("p95_gap_s"),
        )
    )
