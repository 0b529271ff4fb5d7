"""Library entry for the tiered rollup job (wrapped by jobs/rollup_job.py
for spark-submit).

Work is partitioned into (tier, day-bucket) units: tier windows (1m/1h/1d,
UTC) never cross a day boundary, so each unit is independently computable
and idempotently overwritable. Every unit commit records input rows,
output windows and wall time in the lineage log; resume skips committed
units whose input fingerprint (rows per unit) is unchanged — exact
mid-tier crash recovery, and late data landing in an old unit changes its
fingerprint and forces recompute of exactly that unit.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.rollup import rollup_kernel
from .streaming.checkpoint import LineageLog

DEFAULT_FEATURES = [
    "n_epochs", "mean", "std", "amplitude", "total_time", "avgt",
    "cads_avg", "cads_med", "cads_std", "median",
    "median_absolute_deviation", "skew", "stetson_j", "stetson_k",
    "weighted_average", "weighted_std_dev", "max_slope",
]


def run_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    tiers=("1m", "1h", "1d"),
    features=None,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
    resume: bool = False,
    bucket_days: int = 7,
    verbose: bool = True,
) -> list[dict]:
    """Run the tiered rollup in per-(tier, day-bucket) committed units.
    Returns the list of unit metric dicts (committed + skipped)."""
    features = list(features or DEFAULT_FEATURES)
    log = LineageLog(os.path.join(output_path, "_lineage"))
    df = spark.read.parquet(input_path)
    day_col = F.date_trunc("day", F.col(ts_col))

    # unit fingerprint: rows per day (one cheap JVM agg; late data landing
    # in an old day changes that day's count and invalidates its units)
    per_day = (
        df.groupBy(day_col.alias("d")).agg(F.count("*").alias("n"))
        .orderBy("d").collect()
    )
    days = [r["d"] for r in per_day]
    day_rows = {r["d"]: r["n"] for r in per_day}
    buckets = [days[i: i + bucket_days] for i in range(0, len(days), bucket_days)]

    results = []
    for tier in tiers:
        for bucket in buckets:
            key = bucket[0].strftime("%Y%m%d")
            unit = f"tier-{tier}-days-{key}"
            rows_in = sum(day_rows[d] for d in bucket)
            if resume and log.is_committed(unit, input_rows=rows_in):
                results.append({"unit": unit, "skipped": True})
                if verbose:
                    print(f"{unit}: committed, skipping (resume)")
                continue
            t0 = time.time()
            scoped = df.filter(day_col.isin(bucket))
            out = rollup_kernel(
                scoped, features, tier,
                key_col=key_col, ts_col=ts_col, tiebreak_col=tiebreak_col,
            )
            dest = os.path.join(output_path, f"tier={tier}", f"bucket={key}")
            out.write.mode("overwrite").parquet(dest)
            n_out = spark.read.parquet(dest).count()
            wall = time.time() - t0
            metrics = {
                "windows_out": n_out,
                "rows_in": rows_in,
                "wall_sec": round(wall, 2),
                "points_per_sec": round(rows_in / wall, 1) if wall > 0 else None,
                "features": len(features),
                "n_days": len(bucket),
                # explicit per-day input fingerprint: retention re-validates
                # each day's CURRENT row count against this before dropping
                # it, so late rows appended after the commit block deletion
                # (and a calendar gap day is never claimed covered)
                "day_rows": {d.strftime("%Y%m%d"): day_rows[d] for d in bucket},
            }
            log.commit(unit, input_rows=rows_in, metrics=metrics)
            results.append({"unit": unit, "skipped": False, **metrics})
            if verbose:
                print(json.dumps({"unit": unit, **metrics}))
    return results
