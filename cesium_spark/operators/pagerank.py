"""Weighted PageRank over an edge relation, and TextRank keyword
extraction built on it (Mihalcea & Tarau, "TextRank: Bringing Order
into Texts", EMNLP 2004; Page, Brin, Motwani, Winograd 1999).

The engine's iterative-relational discipline (same as kmeans.py /
bpe.py): the CORPUS is scanned exactly once, reducing map-side to a
bounded graph relation (edges = co-occurring token pairs, vocabulary-
squared-bounded per document, never corpus-sized); every PageRank
round is then one equi-join + one groupBy on that graph relation only.
Per-round lineage is truncated with localCheckpoint so the iterated
plan stays compilable. Scores are rounded each round (round(x + EPS,
digits)) so a DuckDB oracle can replay the iterations as chained CTEs
bit-for-bit — the kmeans_clusters adjudication idiom.

Scale shape at 100 TB: the rank vector is |V| rows (df-banded
vocabulary for TextRank), the edge relation |E| rows; both live
executor-side and shuffle on token keys. Nothing per-round touches
the documents table. AQE picks broadcast vs sort-merge for the
rank⋈edge join by the measured rank-relation size — at agent-corpus
vocabularies the rank side broadcasts; at web vocabularies it
degrades gracefully to a key-partitioned join instead of OOMing the
driver (so the join is deliberately NOT hinted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "textrank_keywords"]

_EPS = 1e-9


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic,
    oracle-replayable — no convergence test, so both engines run the
    identical recursion):

        r_v <- (1 - d) + d * sum_{(u,v) in E} (w_uv / W_u) * r_u

    with W_u = sum of u's out-weights and r initialised to 1.0 (the
    TextRank normalisation, which keeps scores O(1) regardless of
    |V|). Edges are used AS GIVEN (directed); symmetrize upstream for
    an undirected graph. Nodes are defined by edge endpoints; rows
    with NULL endpoints are dropped. Scores round to ``round_digits``
    every round so float sum-order noise cannot drift across engines.

    Returns (node, score). One equi-join + one groupBy per round over
    the edge relation only.
    """
    e = (
        edges.select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            (F.col(weight_col).cast("double") if weight_col else F.lit(1.0)).alias("_w"),
        )
        .where(F.col("_src").isNotNull() & F.col("_dst").isNotNull())
    )
    # out-weight per source, folded into the edge relation once so each
    # round's join carries the ready contribution fraction
    wdeg = e.groupBy("_src").agg(F.sum("_w").alias("_wout"))
    frac = (
        e.join(wdeg, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_wout")).alias("_f"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        frac.select(F.col("_src").alias("node"))
        .union(frac.select(F.col("_dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("score")).localCheckpoint(eager=False)
    base = F.lit(float(1.0 - damping))
    for _ in range(n_iter):
        contrib = (
            frac.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("_f") * F.col("score")).alias("_in"))
        )
        # every node of a symmetrized graph has in-edges, but keep the
        # directed-graph dangling case correct: no inflow -> base only
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    base + F.lit(float(damping)) * F.coalesce(F.col("_in"), F.lit(0.0))
                    + F.lit(_EPS),
                    round_digits,
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_docs: int = 5,
    damping: float = 0.85,
    n_iter: int = 8,
    k: int = 30,
    round_digits: int = 6,
) -> DataFrame:
    """TextRank keyword extraction over the corpus co-occurrence graph:
    nodes are tokens, undirected edges connect tokens that co-occur in
    a document, edge weight = number of co-occurring documents
    (document frequency, the same estimate token_pmi uses), pruned at
    ``min_pair_docs`` so stopword noise cannot inflate |E|. Top-k
    tokens by PageRank score, ties broken lexicographically.

    The corpus reduces map-side to DISTINCT (doc, token) pairs; the
    pair self-join's fan-out is per-document-vocabulary squared
    (bounded by document length, never corpus size). The PageRank
    rounds then run on the token-pair relation alone.
    """
    from cesium_spark.operators.text import _tokens
    from pyspark.sql.window import Window

    pairs = (
        df.select(F.col(id_col).alias("_d"), F.explode(_tokens(text_col)).alias("t"))
        .distinct()
    )
    co = (
        pairs.alias("x")
        .join(pairs.alias("y"), "_d")
        .where(F.col("x.t") < F.col("y.t"))
        .groupBy(F.col("x.t").alias("a"), F.col("y.t").alias("b"))
        .agg(F.count("*").cast("double").alias("w"))
        .where(F.col("w") >= min_pair_docs)
    )
    edges = co.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").union(
        co.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    ranks = pagerank(
        edges, weight_col="w", damping=damping, n_iter=n_iter,
        round_digits=round_digits,
    )
    top = ranks.orderBy(F.col("score").desc(), F.col("node")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("node"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col("node").alias("token"), "score"
    )
