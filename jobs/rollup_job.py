"""spark-submit entry point: tiered transcript rollup with lineage.

Usage:
  spark-submit --master local[8] --py-files cesium_spark.zip \
      jobs/rollup_job.py --input <parquet> --output <dir> \
      [--tiers 1m,1h,1d] [--features f1,f2,...] [--resume]

Reads the transcript table, runs the tier rollups (kernel featurization),
writes one parquet per tier plus a lineage/metrics checkpoint enabling
exact resume (see cesium_spark.streaming.checkpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_FEATURES = [
    "n_epochs", "mean", "std", "amplitude", "total_time", "avgt",
    "cads_avg", "cads_med", "cads_std", "median",
    "median_absolute_deviation", "skew", "stetson_j", "stetson_k",
    "weighted_average", "weighted_std_dev", "max_slope",
]


def main(argv=None):
    from pyspark.sql import SparkSession

    from cesium_spark.operators.rollup import rollup_kernel
    from cesium_spark.streaming.checkpoint import LineageLog

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tiers", default="1m,1h,1d")
    p.add_argument("--features", default=",".join(DEFAULT_FEATURES))
    p.add_argument("--key-col", default="conv_id")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--tiebreak-col", default="turn_idx")
    p.add_argument("--resume", action="store_true",
                   help="skip tiers already committed in the lineage log")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cesium-spark-rollup").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    feats = args.features.split(",")
    tiers = args.tiers.split(",")

    log = LineageLog(os.path.join(args.output, "_lineage"))
    df = spark.read.parquet(args.input)
    n_in = df.count()

    for tier in tiers:
        if args.resume and log.is_committed(f"tier-{tier}", input_rows=n_in):
            print(f"tier {tier}: already committed, skipping (resume)")
            continue
        t0 = time.time()
        out = rollup_kernel(
            df, feats, tier,
            key_col=args.key_col, ts_col=args.ts_col, tiebreak_col=args.tiebreak_col,
        )
        dest = os.path.join(args.output, f"tier={tier}")
        out.write.mode("overwrite").parquet(dest)
        n_out = spark.read.parquet(dest).count()
        wall = time.time() - t0
        log.commit(
            f"tier-{tier}",
            input_rows=n_in,
            metrics={
                "windows_out": n_out,
                "wall_sec": round(wall, 2),
                "points_per_sec": round(n_in / wall, 1),
                "features": len(feats),
            },
        )
        print(json.dumps({"tier": tier, "windows": n_out, "wall_sec": round(wall, 2),
                          "points_per_sec": round(n_in / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
