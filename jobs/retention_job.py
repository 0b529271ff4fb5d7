"""spark-submit entry point: retention enforcement over a snapshot table.

Usage:
  spark-submit --master local[8] --py-files cesium_spark.zip \
      jobs/retention_job.py --table <snapshot-table-dir> \
      --lineage <rollup-output>/_lineage --horizon 2025-02-01 \
      [--tiers 1m,1h,1d] [--dry-run]

Drops raw rows of days strictly older than --horizon ONLY when every
tier's rollup unit covering that day is committed in the lineage log
with a per-day input fingerprint matching the table's CURRENT row
counts (late-arriving rows block the drop until a rollup recommit).
Deletion writes a new snapshot — prior snapshots still time-travel to
the raw data until vacuumed. --dry-run reports what would drop without
writing. Prints one JSON report line.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from pyspark.sql import SparkSession

    from cesium_spark.operators.retention import (
        apply_retention, current_day_rows, droppable_days)
    from cesium_spark.sources.table import SnapshotTable
    from cesium_spark.streaming.checkpoint import LineageLog

    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="SnapshotTable root dir")
    p.add_argument("--lineage", required=True, help="rollup lineage log dir")
    p.add_argument("--horizon", required=True,
                   help="ISO date; days strictly older become droppable")
    p.add_argument("--tiers", default="1m,1h,1d")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cesium-spark-retention").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    table = SnapshotTable(args.table)
    log = LineageLog(args.lineage)
    horizon = dt.datetime.fromisoformat(args.horizon)
    tiers = args.tiers.split(",")

    if args.dry_run:
        df = table.read(spark)
        day_rows = current_day_rows(df, args.ts_col)
        drop = droppable_days(df, log, tiers, horizon, args.ts_col,
                              day_rows=day_rows)
        report = {
            "dry_run": True,
            "would_drop_days": [d.isoformat() for d in drop],
            "would_drop_rows": sum(day_rows[d] for d in drop),
            "blocked_days": [
                d.isoformat() for d in sorted(day_rows)
                if d < horizon and d not in set(drop)
            ],
        }
    else:
        report = apply_retention(
            spark, table, log, tiers, horizon, args.ts_col)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
