"""Retention enforcement: drop raw data below the tier horizon once its
rollups are committed.

The retention engine's contract (north rule): raw rows older than the
horizon are deleted ONLY if every tier's rollup unit covering that day is
committed in the lineage log — a crash between rollup and retention can
never lose data that hasn't been rolled up. Deletion is a new snapshot of
the SnapshotTable (old snapshots still time-travel to the raw data until
physically vacuumed), so retention itself is atomic and reversible.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.table import SnapshotTable
from ..streaming.checkpoint import LineageLog

__all__ = [
    "droppable_days", "retention_decision", "apply_retention",
    "current_day_rows",
]


def droppable_days(
    df: DataFrame,
    log: LineageLog,
    tiers,
    horizon: dt.datetime,
    ts_col: str = "ts",
    day_rows: dict | None = None,
) -> list[dt.datetime]:
    """Days strictly older than `horizon` whose rollup units are committed
    for EVERY tier AND whose committed per-day input fingerprint still
    matches the raw table.

    A unit covers a day only if its commit metrics record that exact day
    key in ``day_rows`` (explicit membership — a calendar day that had no
    rows at rollup time is never claimed covered by a spanning bucket)
    with a row count equal to the day's CURRENT count in the raw table.
    Late-arriving rows appended to an already-committed old day change
    the current count, so the day stays blocked until the next rollup
    recommits the unit with a fresh fingerprint — the module contract
    ('never lose data that hasn't been rolled up') holds even when
    retention runs before the rollup's own resume pass. Commits without
    ``day_rows`` (pre-fingerprint lineage) conservatively never cover.
    """
    current = day_rows if day_rows is not None else current_day_rows(df, ts_col)
    per_tier_day_rows: dict[str, list[dict]] = {}
    for tier in tiers:
        prefix = f"tier-{tier}-days-"
        per_tier_day_rows[tier] = [
            dr
            for u in log.units()
            if u.startswith(prefix)
            and (entry := log.read(u)) is not None
            and (dr := entry.get("metrics", {}).get("day_rows"))
        ]
    out = []
    for d in sorted(current):
        if d >= horizon:
            continue
        key = d.strftime("%Y%m%d")
        if all(
            any(dr.get(key) == current[d] for dr in per_tier_day_rows[tier])
            for tier in tiers
        ):
            out.append(d)
    return out


def retention_decision(
    df: DataFrame,
    commits: DataFrame,
    tiers,
    horizon: dt.datetime,
    ts_col: str = "ts",
) -> DataFrame:
    """The retention decision as a RELATIONAL computation — the
    distributed form of `droppable_days` for tables where per-day counts
    should never be collected to the driver. Same contract (see
    `droppable_days`): a day is droppable only when it is strictly older
    than `horizon` AND every tier has a committed fingerprint whose row
    count equals the day's CURRENT count in the raw table.

    `commits` is the committed-unit fingerprint relation
    (tier string, day timestamp, n_rows long) — i.e. the lineage log's
    per-day ``day_rows`` metrics as a table (one row per commit; a unit
    recommitted after late data contributes a second row with the fresh
    count, and matching ANY commit covers, exactly like droppable_days).

    Returns one row per day present in the raw table:
    (day, n_rows, verdict) with verdict one of
      'droppable'            — old + every tier fingerprint-matched
      'blocked_late_data'    — old, all tiers committed, but some tier's
                               counts all mismatch (late rows arrived
                               after the commit; rollup must recommit)
      'blocked_uncommitted'  — old, some tier has no commit for the day
      'retained_recent'      — inside the horizon, not retention's
                               business yet
    Plan: one groupBy over the raw table + one equi-join on day against
    the (tiny) commit relation + one aggregation — no driver-side state,
    no per-day loops; scales with #days, not #rows."""
    tiers = list(tiers)
    cur = (
        df.select(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_rows"))
    )
    com = commits.filter(F.col("tier").isin(tiers)).select(
        "tier", F.col("day").alias("cday"), F.col("n_rows").alias("cn")
    )
    per_day = (
        cur.join(com, cur["day"] == com["cday"], "left")
        .groupBy("day", "n_rows")
        .agg(
            F.count_distinct("tier").alias("tiers_committed"),
            F.count_distinct(
                F.when(F.col("cn") == F.col("n_rows"), F.col("tier"))
            ).alias("tiers_matched"),
        )
    )
    n_tiers = len(tiers)
    verdict = (
        F.when(F.col("day") >= F.lit(horizon), F.lit("retained_recent"))
        .when(F.col("tiers_committed") < n_tiers, F.lit("blocked_uncommitted"))
        .when(F.col("tiers_matched") < n_tiers, F.lit("blocked_late_data"))
        .otherwise(F.lit("droppable"))
    )
    return per_day.select("day", "n_rows", verdict.alias("verdict"))


def current_day_rows(df: DataFrame, ts_col: str = "ts") -> dict:
    """Current row count per day — ONE aggregation, O(#days) rows to the
    driver; every count retention reports derives from this map (no
    full-table count() actions)."""
    return {
        r["d"]: r["n"]
        for r in df.select(F.date_trunc("day", F.col(ts_col)).alias("d"))
        .groupBy("d").agg(F.count("*").alias("n")).collect()
    }


def apply_retention(
    spark: SparkSession,
    table: SnapshotTable,
    log: LineageLog,
    tiers,
    horizon: dt.datetime,
    ts_col: str = "ts",
) -> dict:
    """Drop raw rows of fully-rolled-up days older than `horizon` by
    writing a new table snapshot; returns a report. Rows of NOT-yet-
    committed old days are retained (and reported) — rollup must catch up
    before retention can advance."""
    df = table.read(spark)
    day_col = F.date_trunc("day", F.col(ts_col))
    day_rows = current_day_rows(df, ts_col)
    drop = droppable_days(df, log, tiers, horizon, ts_col, day_rows=day_rows)
    total = sum(day_rows.values())
    if drop:
        kept = df.filter(~day_col.isin(drop))
    else:
        kept = df
    kept_n = total - sum(day_rows[d] for d in drop)
    blocked = sorted(
        d for d in day_rows if d < horizon and d not in set(drop)
    )
    snapshot_id = table.overwrite(kept) if drop else table.current_snapshot_id()
    return {
        "dropped_days": [d.isoformat() for d in sorted(drop)],
        "blocked_days": [d.isoformat() for d in sorted(blocked)],
        "rows_before": total,
        "rows_after": kept_n,
        "snapshot_id": snapshot_id,
    }
