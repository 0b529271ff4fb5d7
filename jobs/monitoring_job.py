"""spark-submit entry point: the per-series monitoring sweep.

Usage:
  spark-submit --master local[8] --py-files cesium_spark.zip \
      jobs/monitoring_job.py --events <events-parquet> --out <dir> \
      [--key-col user_id] [--type-col event_type]

One pass of the diagnostics family over an events table:

  <out>/series_health/      per-actor dashboard rows (trend, whiteness,
                            long memory, random-walk, drift, changepoint)
  <out>/lateness/           per-type out-of-orderness + the p99-lateness
                            watermark recommendation
  <out>/forecast_interval/  per-type seasonal-naive next-hour forecast
                            with a conformal 90% interval

Prints ONE JSON report line: row counts per output, the count of
actors with a drift alarm or a called trend, and the max recommended
watermark across types — the numbers an on-call person actually pages
on. Parquet outputs are overwritten per run (the job is a snapshot
sweep, not an incremental sink).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cesium_spark.operators.analytics import series_health
    from cesium_spark.operators.lateness import lateness_profile
    from cesium_spark.operators.tsstats import seasonal_naive_interval

    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True, help="events parquet path")
    p.add_argument("--out", required=True, help="output root dir")
    p.add_argument("--key-col", default="user_id")
    p.add_argument("--type-col", default="event_type")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cesium-spark-monitoring").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(args.events)

    health = series_health(ev, key_col=args.key_col)
    health.write.mode("overwrite").parquet(f"{args.out}/series_health")
    health = spark.read.parquet(f"{args.out}/series_health")

    late = lateness_profile(ev, key_col=args.type_col)
    late.write.mode("overwrite").parquet(f"{args.out}/lateness")
    late = spark.read.parquet(f"{args.out}/lateness")

    fci = seasonal_naive_interval(ev, key_col=args.type_col)
    fci.write.mode("overwrite").parquet(f"{args.out}/forecast_interval")
    fci = spark.read.parquet(f"{args.out}/forecast_interval")

    summary = health.agg(
        F.count("*").alias("n_series"),
        F.sum(F.when(F.col("level_drift"), 1).otherwise(0)).alias("n_drift"),
        F.sum(F.when(F.col("trend") != "none", 1).otherwise(0))
        .alias("n_trending"),
    ).collect()[0]
    wm = late.agg(F.max("p99_late_s").alias("m")).collect()[0]["m"]
    report = {
        "job": "monitoring",
        "n_series": summary["n_series"],
        "n_drift_alarms": int(summary["n_drift"]),
        "n_trending": int(summary["n_trending"]),
        "n_lateness_rows": late.count(),
        "n_forecast_rows": fci.count(),
        "watermark_rec_s": None if wm is None else float(wm),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
    from pyspark.sql import SparkSession

    SparkSession.getActiveSession().stop()
