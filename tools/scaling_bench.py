"""Two-parallelism-level scaling harness — the north rule's N -> 4N
criterion, evidenced per BASELINE.md by running the identical job at two
local parallelism levels (no real multi-node cluster exists in this
sandbox) and reporting throughput at both plus the efficiency.

Workload (BENCH/BASELINE.md "Definitive scaling run" protocol): 1h-tier
rollup of the full cesium-equivalent per-window featureset — whole
cadence block + general block, LS/QSO/period_fast excluded as
window-optional (67 features) — over the deterministic 25M-turn table
at /tmp/cesium_bench_big (datagen seed=43, n_convs=4000,
max_turns=50000; regenerated here if absent — 50000 is the cap that
reproduces the documented 25,058,920-turn table exactly; the script
historically said 20000 while reading a table generated elsewhere, a
latent mismatch that only bit when /tmp was wiped in r6 session 8).

Usage:
  python tools/scaling_bench.py <cores> [trials]     # one level
Prints one JSON line: {"cores": N, "trials_sec": [...], "best_sec": ...,
"points_per_sec": ..., "n_turns": ...}.

Run levels in separate processes (fresh JVM each) on an otherwise idle
machine; efficiency = pps(4N) / (4 * pps(N)).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = os.environ.get("SPARK_GRAFT_BIG_PATH", "/tmp/cesium_bench_big")


def main():
    cores = int(sys.argv[1])
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cesium_spark.features.registry import CADENCE_FEATS, GENERAL_FEATS
    from cesium_spark.operators.rollup import rollup_kernel
    from cesium_spark.session import get_spark

    feats = [
        f
        for f in (*CADENCE_FEATS, *GENERAL_FEATS)
        if f not in ("period_fast", "qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu")
    ]
    assert len(feats) == 67, len(feats)

    spark = get_spark(
        app_name=f"cesium-scaling-{cores}c",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g")},
    )
    if not os.path.exists(os.path.join(BIG, "_SUCCESS")):
        from cesium_spark.datagen import generate_transcripts

        generate_transcripts(
            spark, n_convs=4000, seed=43, max_turns=50_000
        ).write.mode("overwrite").parquet(BIG)
    tr = spark.read.parquet(BIG)
    tr.write.mode("overwrite").format("noop").save()  # warm page cache, untimed
    n_turns = tr.count()

    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        rollup_kernel(tr, feats, "1h").write.mode("overwrite").format("noop").save()
        ts.append(round(time.perf_counter() - t0, 1))
    best = min(ts)
    print(
        json.dumps(
            {
                "cores": cores,
                "trials_sec": ts,
                "best_sec": best,
                "n_turns": n_turns,
                "points_per_sec": round(n_turns / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
