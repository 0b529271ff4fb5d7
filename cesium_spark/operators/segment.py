"""RFM actor segmentation (recency / frequency / monetary quintiles).

The classic marketing-analytics operator (Hughes 1994), useful here as
actor triage over agent-transcript event streams: actors are scored
1-5 on each axis by exact quintile rank (ntile) and the concatenated
digits form the segment code (555 = recent + busy + high-value).

Scale design: everything after the first aggregation runs on the
ACTOR-sized relation (one row per actor), so the three unpartitioned
ntile sorts — the only single-task stages — sort |actors| rows, not
events. That is the same post-aggregation altitude as the engine's
other global rankings (value_percentiles, tail_index); if the actor
population itself outgrew a task, swap ntile for percentile-threshold
binning against approx quantiles (the psi_drift edge pattern) at the
cost of exact tie handling. The event-scale work is ONE partial-
aggregable groupBy.

Determinism: every ntile ORDER BY carries the actor id as the final
tiebreak, so the quintile boundary assignment of tied metrics is
identical in Spark and the DuckDB oracle (both implement SQL-standard
ntile over a total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel import ts_micros

__all__ = ["rfm_scores"]


def rfm_scores(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    monetary_type: str | None = "purchase",
    type_col: str = "event_type",
    n_tiles: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Per-actor (recency_days, frequency, monetary) with 1-5 quintile
    scores and the combined ``rfm`` code. Recency is whole days from
    the actor's last event to the stream's max timestamp; monetary
    sums `value_col` over `monetary_type` events (0.0 for actors who
    never convert). Higher score = better (more recent / more active /
    higher spend)."""
    us = ts_micros(F.col(ts_col))
    mon = (
        F.when(F.col(type_col) == monetary_type, F.col(value_col))
        if monetary_type is not None else F.col(value_col)
    )
    per_actor = df.groupBy(key_col).agg(
        F.max(us).alias("_last_us"),
        F.count("*").cast("long").alias("frequency"),
        F.round(F.coalesce(F.sum(mon), F.lit(0.0)) + F.lit(1e-9),
                round_digits).alias("monetary"),
    )
    # stream max ts: a 1-row aggregate broadcast into the actor relation
    mx = df.agg(F.max(us).alias("_max_us"))
    per_actor = per_actor.crossJoin(F.broadcast(mx)).select(
        F.col(key_col),
        F.floor((F.col("_max_us") - F.col("_last_us")) / F.lit(86400e6))
        .cast("long").alias("recency_days"),
        "frequency", "monetary",
    )
    # quintiles over the actor-sized relation; best gets n_tiles
    wr = Window.orderBy(F.col("recency_days").desc(), F.col(key_col))
    wf = Window.orderBy(F.col("frequency").asc(), F.col(key_col))
    wm = Window.orderBy(F.col("monetary").asc(), F.col(key_col))
    scored = per_actor.select(
        "*",
        F.ntile(n_tiles).over(wr).cast("int").alias("r_score"),
        F.ntile(n_tiles).over(wf).cast("int").alias("f_score"),
        F.ntile(n_tiles).over(wm).cast("int").alias("m_score"),
    )
    return scored.select(
        key_col, "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int").alias("rfm"),
    )
