"""Consecutive-run statistics over per-actor event streams — the
loop-detection primitive for agent-transcript pipelines (an agent stuck
re-issuing the same action shows up as a long run of identical events).

Gaps-and-islands: one change flag per row (lag over the per-actor
order), a running sum turns flags into island ids, and two cheap
aggregations produce per-actor run statistics. One shuffle on the
actor key; the windows and aggregations are partition-local after it.
Every step is expressible identically in ANSI SQL, so the DuckDB
oracle replays the exact dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["event_run_stats"]


def event_run_stats(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    loop_threshold: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Per-actor consecutive-run statistics: ``n_events``, ``n_runs``
    (maximal same-type runs), ``max_run`` (longest run length),
    ``repeat_frac`` ((n_events - n_runs) / n_events — the fraction of
    events repeating their predecessor), and ``looping`` (1 when
    max_run >= loop_threshold). Ordering is (ts, tiebreak) so ties are
    deterministic across engines and partitionings."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(type_col).over(w)
    # null-safe boundary (== the oracle's IS DISTINCT FROM): the first
    # row and any type CHANGE — incl. NULL<->value — start a run, but
    # NULL following NULL continues one
    chg = F.when(~prev.eqNullSafe(F.col(type_col)), F.lit(1)).otherwise(F.lit(0))
    island = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        df.select(F.col(key_col), island.alias("island"))
        .groupBy(key_col, "island")
        .agg(F.count("*").alias("len"))
    )
    n_events = F.sum("len")
    n_runs = F.count("*")
    return runs.groupBy(key_col).agg(
        n_events.cast("long").alias("n_events"),
        n_runs.cast("long").alias("n_runs"),
        F.max("len").cast("long").alias("max_run"),
        F.round(
            (n_events - n_runs).cast("double") / n_events + F.lit(1e-9),
            round_digits,
        ).alias("repeat_frac"),
        (F.max("len") >= loop_threshold).cast("int").alias("looping"),
    )
