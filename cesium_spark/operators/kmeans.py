"""Distributed Lloyd's k-means over an embedding column.

Built so the WHOLE fit is a deterministic dataflow an independent SQL
engine can replay (the DuckDB oracle runs the same chained iterations):

- init: the k lowest-id vectors (TakeOrderedAndProject, no sampling);
- assignment: squared euclidean distance to each centroid as a JVM
  fold (``aggregate(zip_with(...))``) — k small inline expressions, no
  Python; argmin via ``array_min`` over (d2, cid) structs so ties break
  on the lower cluster id in every engine;
- update: ``posexplode`` + one map-side-combinable (cluster, pos)
  average; only the k x dim rounded centroid matrix is collected to
  the driver between iterations (bounded, independent of corpus size).

Cross-engine float discipline (the repo-wide convention): inputs,
distances, and centroid means are all rounded to ``round_digits`` with
the +1e-9 half-up nudge, so double summation-order differences between
engines (and between Spark partitionings) cannot flip an argmin.

At 100 TB the assignment stage is a map-only scan (centroids ride
inline / via broadcast), and the update shuffles k x dim partial sums
per partition — the classic scalable Lloyd layout. For large k, swap
the inline expressions for one pandas_udf against a broadcast centroid
matrix; the dataflow is unchanged.

An empty cluster (no members after an assignment pass) drops out of
the fit, exactly like the oracle's group-by does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assignments"]


def _rounded_vec(vec_col: str, round_digits: int):
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x + F.lit(1e-9), round_digits),
    )


def _d2_expr(v, cent: list, round_digits: int):
    """round(sum((v_i - c_i)^2) + 1e-9, digits) as a sequential JVM fold."""
    carr = F.array(*[F.lit(float(x)) for x in cent])
    sq = F.zip_with(v, carr, lambda x, y: (x - y) * (x - y))
    acc = F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)
    return F.round(acc + F.lit(1e-9), round_digits)


def _assign(df: DataFrame, id_col: str, v, cents: list, round_digits: int,
            with_vec: bool) -> DataFrame:
    """One map-only assignment pass: argmin_{cid} d2, ties to lower cid."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _d2_expr(v, c, round_digits).alias("d2"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, c in cents
            ]
        )
    )
    cols = [F.col(id_col), best["cid"].alias("cluster"), best["d2"].alias("dist2")]
    if with_vec:
        cols.append(v.alias("_v"))
    return df.select(*cols)


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
):
    """Fit k-means with ``iters`` Lloyd updates and return
    (assignments DataFrame (id, cluster, dist2), centroids) where
    centroids is the final [(cid, [floats])] list. ``cluster`` ids are
    the 0-based ranks of the init vectors; clusters that empty out
    during a pass disappear."""
    v = _rounded_vec(vec_col, round_digits)
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(v.alias("_v"))
        .collect()
    )
    cents = [(cid, list(r["_v"])) for cid, r in enumerate(init)]

    for _ in range(iters):
        assigned = _assign(df, id_col, v, cents, round_digits, with_vec=True)
        rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val") + F.lit(1e-9), round_digits).alias("cm"))
            .collect()
        )
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(r["cluster"], {})[r["pos"]] = r["cm"]
        cents = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]

    final = _assign(df, id_col, v, cents, round_digits, with_vec=False)
    return final, cents


def kmeans_assignments(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Convenience: just the final (id, cluster, dist2) assignment."""
    final, _ = kmeans_fit(df, k=k, iters=iters, id_col=id_col,
                          vec_col=vec_col, round_digits=round_digits)
    return final
