"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query side and
evaluate the dot product JVM-side with zip_with/aggregate, no Python.
Scale path: random-hyperplane LSH bucketing — candidates share a bucket
key, so the pairwise evaluation touches a tiny candidate set instead of
the full cross product; hyperplanes are seeded-deterministic.

Ranking determinism: ranks are assigned on (round(cos, 6) desc, id asc) so
two engines computing cosine with different float orders produce identical
rankings (raw float ties would be engine-dependent).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine_topk_bruteforce", "lsh_bucket_topk", "ivf_topk"]


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query among the corpus
    (self-matches excluded). Queries are broadcast — the corpus is
    scanned once, no shuffle of the big side."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_expr("qv", "cv"), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets candidates,
    cosine evaluated only within the query's bucket.

    At corpus scale N and B ~ 2^n_planes buckets the candidate set is
    ~N/B per query — the cross product never materializes. Recall is
    tunable via n_planes (fewer planes = bigger buckets = higher recall).
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def sig_expr(col: str):
        bits = []
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(x)) for x in planes[p]])
            dot = F.aggregate(
                F.zip_with(F.col(col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        sig_expr(vec_col).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        sig_expr(vec_col).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_expr("qv", "cv"), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _kmeans_centroids(sample: np.ndarray, n_lists: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (the
    training set is a bounded sample regardless of corpus size)."""
    rng = np.random.RandomState(seed)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True).clip(1e-12)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned
    to their nearest spherical-k-means centroid list; each query probes
    its n_probe nearest lists and scores only those members.

    Scale path: centroids train on a bounded driver-side sample, the
    assignment is one broadcast-centroid pass over the corpus, and the
    probe join touches ~n_probe/n_lists of the data per query. Recall is
    tunable via n_probe (n_probe = n_lists degenerates to brute force).
    """
    import pandas as pd
    from pyspark.sql.types import IntegerType

    sample_rows = (
        corpus.select(vec_col).limit(train_sample).toPandas()[vec_col].tolist()
    )
    cents = _kmeans_centroids(np.asarray(sample_rows, dtype=np.float64), n_lists, seed)

    def assign_fn(cols):
        vs = np.asarray(cols.tolist(), dtype=np.float64)
        vs = vs / np.linalg.norm(vs, axis=1, keepdims=True).clip(1e-12)
        return pd.Series((vs @ cents.T).argmax(axis=1).astype(np.int32))

    assign_udf = F.pandas_udf(assign_fn, IntegerType())

    def probe_fn(cols):
        vs = np.asarray(cols.tolist(), dtype=np.float64)
        vs = vs / np.linalg.norm(vs, axis=1, keepdims=True).clip(1e-12)
        sims = vs @ cents.T
        order = np.argsort(-sims, axis=1)[:, : min(n_probe, len(cents))]
        return pd.Series([row.astype(int).tolist() for row in order])

    probe_udf = F.pandas_udf(probe_fn, "array<int>")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign_udf(F.col(vec_col)).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_udf(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_expr("qv", "cv"), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
