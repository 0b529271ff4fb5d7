"""Benchmark runner: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). The transcript rollup queries additionally report
points/sec throughput (the BASELINE.md metric) in the "throughput" extra.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1000"))


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _loadavg():
    """1-minute load average — sampled around every trial so contaminated
    bench windows self-identify from the JSON (r5 verdict: two driver-facing
    windows were bimodal-noise-inflated and needed a manual adjudication)."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:  # non-Linux fallback
        return -1.0


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from cesium_spark.datagen import generate_transcripts
    from cesium_spark.operators.rollup import rollup_kernel, rollup_sql
    from cesium_spark.session import get_spark

    spark = get_spark(
        app_name="cesium-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        # 16g, not 48g: measured on this VM (r6 session 8), the 48g heap
        # costs ~3x on the transcript queries — G1 young-GC pauses hit
        # 850 ms (4.3 s GC per 21 s trial, MXBean-measured) and lazily
        # committed heap pages churn; at 16g the same plans run 2.3 s /
        # 5.0 s (sqlpath/kernel) vs 6-18 s / 14-26 s at 48g. 16g still
        # leaves ~10g unified memory for the 2.2 GB scan + shuffles.
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g")},
    )
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    qfns = entry.queries()
    # the dedup headline is the PRODUCTION plan (JVM-native xxhash64
    # minhashes — r3 VERDICT item 3): the md5 variant exists only so the
    # DuckDB oracle can recompute signatures, and timing the oracle tax
    # as the headline hid the engine's actual corpus-dedup cost (2.5 s
    # vs 13.4 s at sf0.1). md5 stays tracked in extras.
    from cesium_spark.operators.dedup import minhash_lsh_pairs

    def _minhash_production(spark_, sf_dir_):
        docs_ = spark_.read.parquet(f"{sf_dir_}/documents.parquet")
        return minhash_lsh_pairs(docs_, hash_fn="xxhash64")

    qfns = dict(qfns)
    qfns["minhash_lsh_xxhash64"] = _minhash_production
    headline = [
        "features_wide",      # full 70-feature kernel per series
        "rollup_1h_sql",      # JVM-only tier rollup
        "rollup_1d_kernel",   # kernel tier rollup
        "locf_1h",            # gap-fill grid
        "agg_merge",          # continuous-aggregate merge path
        "minhash_lsh_xxhash64",  # dedup LSH, production hash path
        "knn_cosine",         # brute-force ANN baseline
        "text_stats",         # text analysis
        "sessionize_30m",     # windowed sessionization
    ]

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    loadavgs: dict[str, list[float]] = {"session_start": [_loadavg()]}

    # warm the JVM + python workers once (tiny query, not timed), and do a
    # full untimed scan of every input table so page-cache state doesn't
    # pollute the timings (count() alone reads only parquet footers)
    _force(qfns["ts_profile_basic"](spark, SF_DIR))
    for tbl in ("events", "documents", "embeddings"):
        _force(spark.read.parquet(f"{SF_DIR}/{tbl}.parquet"))

    # best-of-2 per headline query: BENCH/BASELINE.md's recorded numbers
    # are best-of-N by protocol, and this VM shows up to 10x wall spread
    # on identical plans (single-shot timings are a steal-time lottery —
    # round 1's misread "regression" came from exactly that)
    verbose = os.environ.get("SPARK_GRAFT_BENCH_VERBOSE")
    for name in headline:
        trials = []
        las = [_loadavg()]
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qfns[name](spark, SF_DIR))
            trials.append(round(time.perf_counter() - t0, 3))
            las.append(_loadavg())
        timings[name] = min(trials)
        loadavgs[name] = las
        if verbose:
            print(f"# {name}: {trials}", file=sys.stderr)

    # transcript rollup throughput (the BASELINE.md metric): deterministic
    # synthetic transcripts written to parquet once (untimed), then the
    # timed scan -> 1h-tier rollup pipeline, reported as points/sec.
    tpath = os.environ.get("SPARK_GRAFT_BENCH_PATH", "/tmp/cesium_bench_transcripts")
    marker = f"{tpath}_n{N_CONVS}_ok"
    if not os.path.exists(marker):
        tr = generate_transcripts(spark, n_convs=N_CONVS, seed=42, max_turns=20000)
        tr.write.mode("overwrite").parquet(tpath)
        open(marker, "w").write("ok")
    tr = spark.read.parquet(tpath)
    _force(tr)  # untimed full scan: warm page cache for fair timing
    n_turns = tr.count()
    feats = ["n_epochs", "mean", "std", "amplitude", "total_time",
             "cads_avg", "cads_med", "median", "median_absolute_deviation",
             "stetson_j", "stetson_k", "skew"]

    # best-of-3 for the two throughput metrics: this VM shows 2-3x
    # run-to-run wall-clock spread on identical plans (steal time), which
    # round 1 misread as a regression; min-of-N is the standard protocol
    # for machine-noise-dominated microbenchmarks and all trials are
    # recorded for inspection
    def _best_of(fn, n=3, label=None):
        trials = []
        las = [_loadavg()]
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            trials.append(round(time.perf_counter() - t0, 3))
            las.append(_loadavg())
        if label:
            loadavgs[label] = las
        return min(trials), trials

    # n=5: the r5-r6 adjudication showed this bandwidth-bound query swings
    # 3.7-27.8 s on an IDLE guest (host-side contention, invisible to guest
    # loadavg) — more trials per window raise the odds one lands clean
    dt, trials = _best_of(lambda: _force(rollup_kernel(tr, feats, "1h")),
                          n=5, label="rollup")
    timings["transcript_rollup_1h"] = dt
    extras["rollup_trials_sec"] = trials
    extras["transcript_turns"] = n_turns
    extras["rollup_points_per_sec"] = round(n_turns / dt, 1)
    extras["rollup_points_per_sec_per_core"] = round(n_turns / dt / CPUS, 1)

    dt, trials = _best_of(lambda: _force(rollup_sql(tr, "1h")), label="sqlpath")
    timings["transcript_rollup_1h_sqlpath"] = dt
    extras["sqlpath_trials_sec"] = trials
    extras["sqlpath_points_per_sec"] = round(n_turns / dt, 1)

    # Gorilla block compression over the same transcripts (1h blocks):
    # timed end-to-end plus the achieved compression ratio vs raw
    # 16-byte (ts, value) points
    from cesium_spark.operators.compress import compress_blocks

    def _compress_pass():
        return (
            compress_blocks(tr, "1h", text_col="text")
            .agg(
                F.sum("raw_bytes").alias("raw"),
                F.sum("block_bytes").alias("blk"),
                F.sum("n_points").alias("pts"),
            )
            .collect()[0]
        )

    totals = None

    def _run_compress():
        nonlocal totals
        totals = _compress_pass()

    # best-of-4 with ALL trials recorded (r4 verdict: the single-number
    # protocol could not distinguish the 991k->343k pts/s "slide" from
    # window noise; r5 adjudication with a clean-window control showed
    # the codec itself at 1.2M pts/s and the slide environmental —
    # tools/gorilla_bench.py reruns that adjudication on demand)
    dt, trials = _best_of(_run_compress, n=4, label="gorilla")
    # extras, not a headline timing: keeps the headline total comparable
    # across rounds (this entry was added in round 2)
    extras["gorilla_compress_1h_sec"] = round(dt, 3)
    extras["gorilla_compress_trials_sec"] = trials
    extras["gorilla_points_per_sec"] = round(totals["pts"] / dt, 1)
    extras["gorilla_compression_ratio"] = round(totals["raw"] / totals["blk"], 2)

    # codec-only control (no text-lineage md5 chain): isolates the
    # Gorilla encode path so hash-path noise can be attributed
    def _run_compress_nohash():
        (
            compress_blocks(tr, "1h", text_col=None,
                            value=F.length("text").cast("double"))
            .agg(F.sum("block_bytes").alias("blk"))
            .collect()
        )

    dt, trials = _best_of(_run_compress_nohash, n=3, label="gorilla_nohash")
    extras["gorilla_nohash_sec"] = round(dt, 3)
    extras["gorilla_nohash_trials_sec"] = trials
    extras["gorilla_nohash_points_per_sec"] = round(totals["pts"] / dt, 1)

    # periodic featureset (Lomb-Scargle grids through the kernel UDF):
    # the heaviest per-series math in the engine — tracked as an extra
    # since round 3 (the vectorized frequency scan) so regressions in the
    # LS hot path are visible per-round; not a headline timing to keep
    # the headline total comparable with rounds 1-2
    # series count from a cheap distinct on the source table — counting
    # the query output would run the whole LS computation a third time
    n_series = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().count()
    )
    dt, trials = _best_of(
        lambda: _force(qfns["features_periodic"](spark, SF_DIR)), n=2,
        label="features_periodic",
    )
    extras["features_periodic_sec"] = round(dt, 3)
    extras["features_periodic_trials_sec"] = trials
    extras["features_periodic_ms_per_series"] = round(1000.0 * dt / n_series, 2)

    # md5 oracle-pinned minhash path (was the headline through r3): same
    # single-shuffle plan as the xxhash64 headline, with the md5 hashing
    # the DuckDB oracle requires — tracked so the oracle tax stays
    # visible and comparable with rounds 1-3
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dt, trials = _best_of(
        lambda: _force(qfns["minhash_lsh"](spark, SF_DIR)), n=2,
        label="minhash_md5",
    )
    extras["minhash_lsh_md5_oracle_sec"] = round(dt, 3)
    extras["minhash_lsh_md5_oracle_trials_sec"] = trials

    # star-edge cluster survivorship (r4: the O(c)-per-bucket production
    # cluster path) end-to-end on the xxhash64 signatures: band rows ->
    # star edges -> connected components -> keeper flags
    from cesium_spark.operators.dedup import lsh_dedup_clusters

    dt, trials = _best_of(
        lambda: _force(lsh_dedup_clusters(docs, hash_fn="xxhash64")), n=2,
        label="lsh_star",
    )
    extras["lsh_star_clusters_sec"] = round(dt, 3)
    extras["lsh_star_clusters_trials_sec"] = trials

    # span-level duplication profile (r4): production xxhash64 path
    from cesium_spark.operators.dedup import duplicate_token_spans

    dt, trials = _best_of(
        lambda: _force(duplicate_token_spans(docs, k=8, hash_fn="xxhash64")),
        n=2, label="dup_spans",
    )
    extras["dup_spans_xxhash64_sec"] = round(dt, 3)
    extras["dup_spans_xxhash64_trials_sec"] = trials

    # IVF-PQ ANN with exact re-rank (r4): codebook train + encode +
    # ADC + shortlist re-rank end-to-end over the sf embeddings
    from cesium_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.limit(20)
    dt, trials = _best_of(
        lambda: _force(
            ivfpq_topk(emb, qs, k=3, n_lists=16, n_probe=10, m=8, rerank=True)
        ),
        n=2, label="ivfpq",
    )
    extras["ivfpq_rerank_sec"] = round(dt, 3)
    extras["ivfpq_rerank_trials_sec"] = trials

    # round-6: incremental continuous-aggregate maintenance vs full
    # recompute on the transcript table — a 1%-of-rows late batch should
    # cost far less than re-rolling history (THE maintenance win; both
    # paths share the kernel, so the ratio is plan-shape, not codegen)
    from cesium_spark.operators.incremental import incremental_rollup

    inc_feats = ["n_epochs", "mean", "std", "amplitude", "median"]
    cutoff = tr.selectExpr("percentile(unix_micros(ts), 0.99)").collect()[0][0]
    base_tr = tr.filter(F.unix_micros("ts") <= cutoff)
    late_tr = tr.filter(F.unix_micros("ts") > cutoff)
    old_rollup = rollup_kernel(base_tr, inc_feats, "1h")
    old_rollup.write.mode("overwrite").parquet(f"{tpath}_oldroll")
    old_rollup = spark.read.parquet(f"{tpath}_oldroll")

    dt, trials = _best_of(
        lambda: _force(
            incremental_rollup(old_rollup, tr, late_tr, inc_feats, "1h")
        ),
        n=2, label="incremental",
    )
    extras["incremental_refresh_sec"] = round(dt, 3)
    extras["incremental_refresh_trials_sec"] = trials
    dt, trials = _best_of(
        lambda: _force(rollup_kernel(tr, inc_feats, "1h")), n=2,
        label="full_recompute",
    )
    extras["full_recompute_sec"] = round(dt, 3)
    extras["full_recompute_trials_sec"] = trials
    extras["incremental_speedup"] = round(
        extras["full_recompute_sec"] / max(extras["incremental_refresh_sec"], 1e-9), 2
    )

    # round-5 continuation: Gopher repetition filters (one-Exchange
    # plan) and the oracle-replayable distributed k-means
    from cesium_spark.operators.kmeans import kmeans_assignments
    from cesium_spark.operators.text import repetition_stats

    docs_r5 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dt, trials = _best_of(lambda: _force(repetition_stats(docs_r5)), n=2, label="doc_repetition")
    extras["doc_repetition_sec"] = round(dt, 3)
    extras["doc_repetition_trials_sec"] = trials
    dt, trials = _best_of(
        lambda: _force(kmeans_assignments(emb, k=4, iters=2)), n=2,
        label="kmeans",
    )
    extras["kmeans_sec"] = round(dt, 3)
    extras["kmeans_trials_sec"] = trials

    # round-6 session-6: the sequence/survival/capacity family over the
    # events table — per-round visibility for the new operator batch
    from cesium_spark.operators.markov import markov_nll
    from cesium_spark.operators.sessionize import session_concurrency
    from cesium_spark.operators.survival import km_survival

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for label, fn in (
        ("markov_nll", lambda: _force(markov_nll(events))),
        ("km_survival", lambda: _force(km_survival(events))),
        ("session_concurrency", lambda: _force(session_concurrency(
            events, gap_minutes=30, key_col="user_id", ts_col="ts",
            tiebreak_col="event_id"))),
    ):
        dt, trials = _best_of(fn, n=2, label=label)
        extras[f"{label}_sec"] = round(dt, 3)
        extras[f"{label}_trials_sec"] = trials

    # round-6 session-11: the diagnostics family — per-round visibility
    # for the grid-bounded long-memory/drift batch (hurst = the x4
    # grid explode; series_health = the six-diagnostic join; page
    # hinkley = the one-sort detector)
    from cesium_spark.operators.analytics import series_health
    from cesium_spark.operators.drift import page_hinkley
    from cesium_spark.operators.longmem import hurst_rs

    events_s11 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for label, fn in (
        ("hurst_rs", lambda: _force(hurst_rs(events_s11))),
        ("page_hinkley", lambda: _force(page_hinkley(events_s11))),
        ("series_health", lambda: _force(series_health(events_s11))),
    ):
        dt, trials = _best_of(fn, n=2, label=label)
        extras[f"{label}_sec"] = round(dt, 3)
        extras[f"{label}_trials_sec"] = trials

    loadavgs["session_end"] = [_loadavg()]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "loadavg": loadavgs,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
