"""SemDeDup — semantic deduplication via k-means-bounded cosine pairs
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The recipe: partition the embedding corpus with k-means, then look for
near-duplicate pairs ONLY within each cluster (the paper's core trick —
semantic duplicates land in the same cluster, so the candidate set per
document shrinks from N to the cluster size), group the qualifying
pairs transitively, and keep one representative per group (here: the
min-id member, the repo-wide deterministic keeper rule; the paper keeps
the member farthest from the centroid — a one-line swap on the keeper
window if a pipeline wants it).

Composition, not reinvention: clustering is `kmeans.kmeans_fit` (the
oracle-replayable Lloyd loop), grouping is `graph.dedup_clusters`
(min-label propagation over the pair edges). This module only owns the
within-cluster pair generation.

Scale shape: the pair stage is a self-equi-join on the cluster id —
candidates are O(sum over clusters of c^2), which is the SemDeDup
contract: k is chosen so the expected cluster size stays bounded
(the paper uses k ~ sqrt(N) and larger; at 100 TB that means tens of
thousands of clusters, each a few thousand vectors). Hot clusters are
an AQE-skew-join-splittable equi-join, and the exact-cosine check runs
as a JVM fold inside the join — no UDFs, no cartesian, the corpus is
never broadcast. Cross-cluster near-duplicates are NOT considered, by
design — that approximation is the paper's speedup, and it is what
distinguishes this operator from the exact
`similarity.embedding_near_dup_pairs` (IVF-bounded, no false
negatives); pipelines that need exactness compose that instead.

Cross-engine discipline: cosine is computed on the RAW vectors and
rounded to ``round_digits`` BEFORE the threshold comparison (the
`embedding_clusters` convention), and the k-means side carries its own
rounding contract, so a DuckDB oracle replays the whole verdict
hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semdedup_pairs", "semdedup"]


def _cos(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(
            F.col(a), F.col(b),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.col(c), F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        )

    return dot / (norm(a) * norm(b))


def semdedup_pairs(
    emb: DataFrame,
    assignments: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id_a, id_b, cluster, cos) for every SAME-CLUSTER pair with
    id_a < id_b and round(cosine, round_digits) >= threshold.
    ``assignments`` is (id, cluster) — typically kmeans_fit output."""
    tagged = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).join(
        assignments.select(
            F.col(id_col).alias("_id"), F.col("cluster").alias("_c")
        ),
        "_id",
    )
    a = tagged.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_c"
    )
    b = tagged.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_c"
    )
    cos = F.round(_cos("_va", "_vb") + F.lit(1e-9), round_digits)
    return (
        a.join(b, "_c")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.col("_c").alias("cluster"), cos.alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-vector SemDeDup verdict: (id, cluster, group_id, is_keeper)
    where ``cluster`` is the k-means cell, ``group_id`` the min-id label
    of the vector's transitive within-cluster duplicate group (its own
    id when it has no qualifying neighbor), and ``is_keeper`` marks the
    one survivor per group — filtering on it is the paper's pruning."""
    from .graph import dedup_clusters
    from .kmeans import kmeans_fit

    assigned, _ = kmeans_fit(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )
    pairs = semdedup_pairs(
        emb, assigned.select(id_col, "cluster"), threshold,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
    )
    groups = dedup_clusters(emb, pairs, id_col=id_col)
    return (
        assigned.select(id_col, "cluster")
        .join(groups, id_col)
        .select(
            id_col, "cluster",
            F.col("cluster_id").alias("group_id"), "is_keeper",
        )
    )
