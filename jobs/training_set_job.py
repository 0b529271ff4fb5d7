"""spark-submit entry point: materialize a training set end-to-end.

Usage:
  spark-submit --master local[8] --py-files cesium_spark.zip \
      jobs/training_set_job.py --input <docs.parquet> --output <dir> \
      [--min-quality 0.5] [--lang en] [--jaccard 0.35] [--shingle-cap 1000] \
      [--span-k 8] [--span-dup-frac 0.5] [--train 0.9 --val 0.05 --test 0.05] \
      [--salt v1] [--write-verdicts]

The full five-stage cleaning precedence (each stage the corresponding
first-class operator, same semantics as the oracled `training_corpus`
driver query) followed by the deterministic md5-bucket split:

  1. near-dup survivorship (char-5-gram jaccard -> connected
     components -> min-id keeper);
  2. span_dup: more than --span-dup-frac of the document's --span-k
     token windows are duplicated corpus-wide (Lee et al. 2022);
  3. language gate (stopword vote == --lang);
  4. quality gate (heuristic score >= --min-quality);
  5. repetition gate (Gopher thresholds, Rae et al. 2021).

Survivors land under <output>/kept partitioned by split
(`split=train|val|test` dirs, full rows, ONE corpus scan via a
dynamic-partition write); per-document verdicts (doc_id, reason, keep,
split) optionally under <output>/verdicts. Split membership is a pure function of (id, salt) —
re-running on a grown corpus never moves an old document between
splits. One JSON report line on stdout.
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

    from cesium_spark.operators.corpus import corpus_verdict, with_split

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--lang", default="en")
    p.add_argument("--jaccard", type=float, default=0.35)
    p.add_argument("--shingle-cap", type=int, default=1000)
    p.add_argument("--span-k", type=int, default=8)
    p.add_argument("--span-dup-frac", type=float, default=0.5)
    p.add_argument("--train", type=float, default=0.9)
    p.add_argument("--val", type=float, default=0.05)
    p.add_argument("--test", type=float, default=0.05)
    p.add_argument("--salt", default="")
    p.add_argument("--write-verdicts", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cesium-spark-training-set").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(args.input)

    fractions = {"train": args.train, "val": args.val, "test": args.test}
    # the shared operators/corpus.py composition — same code path the
    # oracled `training_corpus` driver query asserts
    verdict = with_split(
        corpus_verdict(
            docs, id_col=args.id_col, text_col=args.text_col,
            min_quality=args.min_quality, lang=args.lang,
            jaccard=args.jaccard, shingle_cap=args.shingle_cap,
            span_k=args.span_k, span_dup_frac=args.span_dup_frac,
            repetition=True,
        ),
        id_col=args.id_col, fractions=fractions, salt=args.salt,
    ).persist()

    # ONE corpus scan for all splits: join the survivor labels and let a
    # dynamic-partition write fan rows into <output>/kept/split=<name>/
    # (the previous per-split left-semi loop re-scanned the corpus once
    # per split — 3x the dominant I/O at scale)
    kept = docs.join(
        verdict.filter("keep").select(args.id_col, "split"), args.id_col
    )
    kept.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(args.output, "kept")
    )
    if args.write_verdicts:
        verdict.write.mode("overwrite").parquet(
            os.path.join(args.output, "verdicts")
        )

    reason_counts = {
        r["reason"]: r["n"]
        for r in verdict.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    split_counts = {
        r["split"]: r["n"]
        for r in verdict.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    verdict.unpersist()
    report = {
        "input_docs": sum(reason_counts.values()),
        "kept": sum(v for k, v in split_counts.items() if k != "dropped"),
        "splits": {k: split_counts.get(k, 0) for k in fractions},
        "dropped_by_reason": {
            k: v for k, v in sorted(reason_counts.items()) if k != "ok"
        },
        "output": os.path.join(args.output, "kept"),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
    from pyspark.sql import SparkSession

    SparkSession.getActiveSession().stop()
