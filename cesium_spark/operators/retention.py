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

__all__ = ["droppable_days", "apply_retention", "current_day_rows"]


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
