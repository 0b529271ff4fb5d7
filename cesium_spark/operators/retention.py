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

__all__ = ["droppable_days", "apply_retention"]


def droppable_days(
    df: DataFrame,
    log: LineageLog,
    tiers,
    horizon: dt.datetime,
    ts_col: str = "ts",
) -> list[dt.datetime]:
    """Days strictly older than `horizon` whose rollup units are committed
    for EVERY tier."""
    days = [
        r[0]
        for r in df.select(F.date_trunc("day", F.col(ts_col)).alias("d"))
        .distinct().collect()
    ]
    committed_units = set(log.units())
    out = []
    for d in sorted(days):
        if d >= horizon:
            continue
        key = d.strftime("%Y%m%d")
        # a day is covered by the bucket unit whose key is <= day within
        # bucket range; conservative check: any unit for each tier whose
        # recorded days include this day
        ok = True
        for tier in tiers:
            covering = [
                u for u in committed_units
                if u.startswith(f"tier-{tier}-days-")
                and _unit_covers(log, u, d)
            ]
            if not covering:
                ok = False
                break
        if ok:
            out.append(d)
    return out


def _unit_covers(log: LineageLog, unit: str, day: dt.datetime) -> bool:
    entry = log.read(unit)
    if not entry:
        return False
    n_days = entry.get("metrics", {}).get("n_days", 1)
    key = unit.rsplit("-", 1)[-1]
    start = dt.datetime.strptime(key, "%Y%m%d")
    return start <= day.replace(tzinfo=None) < start + dt.timedelta(days=n_days)


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
    drop = droppable_days(df, log, tiers, horizon, ts_col)
    day_col = F.date_trunc("day", F.col(ts_col))
    total = df.count()
    if drop:
        kept = df.filter(~day_col.isin(drop))
    else:
        kept = df
    kept_n = kept.count()
    blocked = [
        r[0]
        for r in df.filter(day_col < F.lit(horizon))
        .select(day_col.alias("d")).distinct().collect()
        if r[0] not in drop
    ]
    snapshot_id = table.overwrite(kept) if drop else table.current_snapshot_id()
    return {
        "dropped_days": [d.isoformat() for d in sorted(drop)],
        "blocked_days": [d.isoformat() for d in sorted(blocked)],
        "rows_before": total,
        "rows_after": kept_n,
        "snapshot_id": snapshot_id,
    }
