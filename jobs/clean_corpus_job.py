"""spark-submit entry point: training-corpus cleaning.

Usage:
  spark-submit --master local[8] --py-files cesium_spark.zip \
      jobs/clean_corpus_job.py --input <docs.parquet> --output <dir> \
      [--min-quality 0.5] [--lang en] [--jaccard 0.35] [--shingle-cap 1000] \
      [--write-verdicts]

Pipeline (each stage is the corresponding first-class operator):
  1. exact + near-dup survivorship: char-5-gram jaccard pairs (capped
     shingle frequency) -> transitive connected components -> min-id
     keeper per cluster;
  2. language gate: stopword-voting guess == --lang;
  3. quality gate: heuristic score >= --min-quality.
Kept documents (full rows) land in <output>/kept; per-document verdicts
(doc_id, reason, keep) optionally in <output>/verdicts. One JSON report
line on stdout (counts per reason) — the shape a pipeline scheduler
ingests.
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

    from cesium_spark.operators.corpus import corpus_verdict

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--lang", default="en")
    p.add_argument("--jaccard", type=float, default=0.35)
    p.add_argument("--shingle-cap", type=int, default=1000)
    p.add_argument("--write-verdicts", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cesium-spark-clean-corpus").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(args.input)

    # the shared operators/corpus.py composition — same code path the
    # oracled driver queries assert, so this job cannot drift from them
    verdict = corpus_verdict(
        docs, id_col=args.id_col, text_col=args.text_col,
        min_quality=args.min_quality, lang=args.lang,
        jaccard=args.jaccard, shingle_cap=args.shingle_cap,
    )

    # the verdict feeds three consumers (kept semi-join, verdict write,
    # report counts) — persist so the text-stats/lang/cluster lineage
    # runs once, not three times
    verdict = verdict.persist()
    kept = docs.join(
        verdict.filter("keep").select(args.id_col), args.id_col, "left_semi"
    )
    kept.write.mode("overwrite").parquet(os.path.join(args.output, "kept"))
    if args.write_verdicts:
        verdict.write.mode("overwrite").parquet(
            os.path.join(args.output, "verdicts")
        )

    counts = {
        r["reason"]: r["n"]
        for r in verdict.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    verdict.unpersist()
    report = {
        "input_docs": sum(counts.values()),  # one row per input doc
        "kept": counts.get("ok", 0),
        "dropped_near_dup": counts.get("near_dup", 0),
        "dropped_lang": counts.get("lang", 0),
        "dropped_low_quality": counts.get("low_quality", 0),
        "output": os.path.join(args.output, "kept"),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
    from pyspark.sql import SparkSession

    SparkSession.getActiveSession().stop()
