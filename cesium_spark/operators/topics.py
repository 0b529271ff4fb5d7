"""Topic discovery over an embedded corpus: k-means clusters labeled by
class-based TF-IDF keywords (the BERTopic recipe — Grootendorst 2022,
"BERTopic: Neural topic modeling with a class-based TF-IDF procedure").

Composition of two already-adjudicated engine pieces: the
oracle-replayable distributed Lloyd's fit (`operators/kmeans.py`) and
the JVM tokenizer (`operators/text.py`). What this file adds is the
c-TF-IDF readout that turns an opaque cluster id into the terms a
curator can act on:

    ctfidf(t, c) = (n_{t,c} / n_c) * ln(1 + A / f_t)

with n_{t,c} the term count inside class c (all member docs
concatenated), n_c the class token total, f_t the corpus-wide term
count, and A the average class token total — BERTopic's smoothed IDF,
which keeps corpus-ubiquitous terms from labeling every cluster.

Scale shape: cluster assignment joins the DOC relation before the
explode (one co-partitioned equi-join on the id), so the tall token
relation is produced exactly once already carrying its class; every
aggregate after that is on (class, term) / (class) / (term) relations
— vocabulary-bounded, never corpus-bounded — and the class-total and
average-size relations are k-sized broadcasts. Top terms per class is
a bounded row_number window over the scored vocabulary relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cluster_keywords"]


def cluster_keywords(
    docs: DataFrame,
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    top_terms: int = 5,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Top c-TF-IDF terms per k-means cluster of the embedding corpus.

    Deterministic end-to-end (lowest-id init, rounded iterations,
    rounded scores, ties on term text), so a SQL oracle can replay the
    full composition. Returns (cluster, rank, token, n_tok, score).
    """
    from cesium_spark.operators.kmeans import kmeans_assignments
    from cesium_spark.operators.text import _tokens

    assign = kmeans_assignments(
        emb, k=k, iters=iters, id_col=vec_id_col, vec_col=vec_col,
        round_digits=round_digits,
    ).select(F.col(vec_id_col).alias(doc_id_col), "cluster")
    from cesium_spark.operators.fanout import fan_out

    toks = (
        fan_out(docs.select(doc_id_col, text_col))
        .join(assign, doc_id_col)
        .select("cluster", F.explode(_tokens(text_col)).alias("t"))
    )
    cnt = toks.groupBy("cluster", "t").agg(F.count("*").cast("long").alias("n_tok"))
    tot = cnt.groupBy("cluster").agg(F.sum("n_tok").cast("long").alias("_tot"))
    ft = cnt.groupBy("t").agg(F.sum("n_tok").cast("long").alias("_f"))
    avg_sz = tot.agg(F.avg(F.col("_tot").cast("double")).alias("_a"))
    scored = (
        cnt.join(F.broadcast(tot), "cluster")
        .join(ft, "t")
        .crossJoin(F.broadcast(avg_sz))
        .select(
            "cluster", "t", "n_tok",
            F.round(
                (F.col("n_tok").cast("double") / F.col("_tot"))
                * F.log(F.lit(1.0) + F.col("_a") / F.col("_f"))
                + F.lit(1e-9),
                round_digits,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.col("score").desc(), F.col("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_terms)
        .select("cluster", "rank", F.col("t").alias("token"), "n_tok", "score")
    )
