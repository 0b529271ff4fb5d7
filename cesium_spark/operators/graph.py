"""Connected components over a candidate-pair graph: the survivorship
step of a dedup pipeline (near-dup PAIRS are only half the job — the
pipeline must pick one keeper per transitive duplicate CLUSTER, and
pairs (a,b), (b,c) must collapse a, b, c together even when (a,c) was
never generated).

Algorithm: iterative min-label propagation — every node's label becomes
the minimum label in its closed neighborhood, repeated to fixpoint. Each
round is one equi-join + one groupBy (shuffles on node id), and the
label sum is monotonically non-increasing, so convergence is detected
with a single scalar aggregate per round (no row-wise diff join).
Rounds needed = the graph diameter; near-dup clusters are dense and
shallow (diameter a handful), so the loop runs 2-4 rounds in practice.
For adversarially chained graphs the published accelerations
(large-star/small-star, Kiveris et al. "Connected Components in
MapReduce and Beyond") drop this to O(log^2 n) rounds with the same
join-shaped primitives; the simple propagation is chosen because dedup
graphs are shallow and every round is a plain AQE-optimized join.

Per-round lineage is truncated with localCheckpoint — without it the
iterated join plan grows exponentially and the driver chokes on plan
compilation long before the executors do any work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component): component = the minimum node id reachable from
    `node` through the undirected edge set. Raises if the propagation has
    not converged after `max_iter` rounds (diameter > max_iter) — a
    silently-wrong cluster label is worse than an error."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("lbl").alias("nlbl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nlbl").alias("cand"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("cand"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:  # monotone -> fixpoint reached
            return labels.select(
                F.col("node"), F.col("lbl").alias("component")
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds max_iter; raise max_iter or use a "
        f"star-contraction variant for chain-shaped graphs)"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment + keeper flag for every document: documents in
    the same transitive near-dup component share cluster_id = the min
    doc id of the component; documents in no pair are their own
    singleton cluster. The keeper (is_keeper) is the min-id member —
    filtering on it yields the deduplicated corpus."""
    cc = connected_components(pairs, src, dst)
    return (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col("cluster_id") == F.col(id_col))
    )
