"""spark-submit form of the N -> 4N scaling workload (the north rule
names spark-submit --py-files explicitly; tools/scaling_bench.py is the
in-process best-of-N protocol, this is the submit-shaped confirmation).

Usage:
  cd /root/repo && zip -qr /tmp/cesium_spark.zip cesium_spark
  spark-submit --master local[4]  --driver-memory 16g --py-files /tmp/cesium_spark.zip \
      tools/scaling_submit.py
  spark-submit --master local[16] --driver-memory 16g --py-files /tmp/cesium_spark.zip \
      tools/scaling_submit.py

Runs the identical job to scaling_bench.py (1h-tier rollup, full
67-feature per-window featureset, 25M-turn table) once, prints one JSON
line with wall + points/sec; the master (and hence core count) comes
from spark-submit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = os.environ.get("SPARK_GRAFT_BIG_PATH", "/tmp/cesium_bench_big")


def main():
    from pyspark.sql import SparkSession

    from cesium_spark.features.registry import CADENCE_FEATS, GENERAL_FEATS
    from cesium_spark.operators.rollup import rollup_kernel

    spark = SparkSession.builder.appName("cesium-scaling-submit").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))

    feats = [
        f
        for f in (*CADENCE_FEATS, *GENERAL_FEATS)
        if f not in ("period_fast", "qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu")
    ]
    tr = spark.read.parquet(BIG)
    tr.write.mode("overwrite").format("noop").save()  # warm cache, untimed
    n_turns = tr.count()
    t0 = time.perf_counter()
    rollup_kernel(tr, feats, "1h").write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "mode": "spark-submit",
                "cores": cores,
                "wall_sec": dt,
                "n_turns": n_turns,
                "points_per_sec": round(n_turns / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
