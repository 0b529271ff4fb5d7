"""Adjudicate the Gorilla compress throughput slide (r2 991k -> r3 510k ->
r4 343k pts/s, each measured in the driver's window of unknown noise).

Protocol (matches the rollup best-of-N protocol in bench.py):
  - same input as bench.py (deterministic transcripts, n_convs=1000 seed=42,
    parquet round-trip, untimed warm scan),
  - best-of-N trials for compress_blocks with ALL trials printed,
  - a CONTROL alongside: transcript_rollup_1h_sqlpath (pure-JVM plan whose
    r2 clean number is 1.69 s) — if the control is at its r2 level in the
    same window, the Gorilla number is adjudicable; if the control is
    inflated too, the window is noisy and the run says nothing.

Usage: python tools/gorilla_bench.py [n_trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import functions as F

    from cesium_spark.datagen import generate_transcripts
    from cesium_spark.operators.compress import compress_blocks
    from cesium_spark.operators.rollup import rollup_sql
    from cesium_spark.session import get_spark

    spark = get_spark(
        app_name="gorilla-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g")},
    )

    tpath = os.environ.get("SPARK_GRAFT_BENCH_PATH", "/tmp/cesium_bench_transcripts")
    marker = f"{tpath}_n{N_CONVS}_ok"
    if not os.path.exists(marker):
        tr = generate_transcripts(spark, n_convs=N_CONVS, seed=42, max_turns=20000)
        tr.write.mode("overwrite").parquet(tpath)
        open(marker, "w").write("ok")
    tr = spark.read.parquet(tpath)
    tr.write.mode("overwrite").format("noop").save()  # warm page cache
    n_turns = tr.count()

    def _trials(fn, n):
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 3))
        return out

    # control first AND last: brackets the window's noise level
    ctrl_fn = lambda: rollup_sql(tr, "1h").write.mode("overwrite").format("noop").save()
    ctrl_pre = _trials(ctrl_fn, 2)

    totals = {}

    def _compress():
        row = (
            compress_blocks(tr, "1h", text_col="text")
            .agg(
                F.sum("raw_bytes").alias("raw"),
                F.sum("block_bytes").alias("blk"),
                F.sum("n_points").alias("pts"),
            )
            .collect()[0]
        )
        totals.update(raw=row["raw"], blk=row["blk"], pts=row["pts"])

    gor = _trials(_compress, n_trials)

    # encode-only variant (no text lineage hash): isolates the codec from
    # the md5 chain so a slide can be attributed
    def _compress_nohash():
        (
            compress_blocks(tr, "1h", text_col=None, value=F.length("text").cast("double"))
            .agg(F.sum("block_bytes").alias("blk"))
            .collect()
        )

    gor_nohash = _trials(_compress_nohash, n_trials)

    ctrl_post = _trials(ctrl_fn, 2)

    best = min(gor)
    print(json.dumps({
        "n_turns": n_turns,
        "control_sqlpath_pre_sec": ctrl_pre,
        "control_sqlpath_post_sec": ctrl_post,
        "control_r2_clean_sec": 1.694,
        "gorilla_trials_sec": gor,
        "gorilla_best_sec": best,
        "gorilla_points_per_sec": round(totals["pts"] / best, 1),
        "gorilla_nohash_trials_sec": gor_nohash,
        "gorilla_nohash_points_per_sec": round(totals["pts"] / min(gor_nohash), 1),
        "gorilla_compression_ratio": round(totals["raw"] / totals["blk"], 2),
        "r_history_points_per_sec": {"r2": 991102.5, "r3": 510406.9, "r4": 342658.7},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
