"""Distributed dense linear algebra over an embedding column:
per-dimension moment statistics and a matrix-free power-iteration
principal component.

The same design contract as operators/kmeans.py (its docstring carries
the full float discipline): every driver round-trip moves only
O(dim)-sized state, every stage is a JVM expression or a
partial-aggregable groupBy, and every value that crosses a collect
boundary is rounded (half-up +1e-9 nudge) so an independent engine
replaying the identical dataflow — the DuckDB oracles chain the same
iterations as CTEs — lands on the same doubles.

Scale shape: the covariance matrix itself (dim x dim) is NEVER
materialized. Power iteration needs only A·w = sum_rows (x·w) x,
which is a map-only dot product against the broadcast/inlined w
followed by one (pos)-keyed partial sum — dim partial rows per
partition per pass, independent of corpus size. That is the standard
matrix-free layout that survives a 100 TB embedding table; more
components = deflation passes with the same dataflow.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_stats", "pca_power", "label_centroids", "label_outliers",
           "label_silhouette"]


def _centered(df: DataFrame, vec_col: str, mu: list, round_digits: int):
    """round(v - mu) as a JVM zip_with against the inlined mean vector."""
    muarr = F.array(*[F.lit(float(m)) for m in mu])
    return F.zip_with(
        F.col(vec_col).cast("array<double>"), muarr,
        lambda x, m: F.round(x - m + F.lit(1e-9), round_digits),
    )


def dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-dimension mean / sample-std / min / max over an
    array<float> column — the profile every embedding pipeline checks
    before normalizing, whitening, or quantizing. posexplode then ONE
    partial-aggregable groupBy on the dimension index (dim groups, so
    map-side combine reduces each partition to dim rows).

    Returns (pos, mean, std, min, max), pos 0-based."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    return ex.groupBy("pos").agg(
        F.round(F.avg("x") + F.lit(1e-9), round_digits).alias("mean"),
        F.round(F.stddev_samp("x") + F.lit(1e-9), round_digits).alias("std"),
        F.round(F.min("x") + F.lit(1e-9), round_digits).alias("min"),
        F.round(F.max("x") + F.lit(1e-9), round_digits).alias("max"),
    )


def pca_power(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top principal component by matrix-free power iteration.

    Deterministic dataflow (oracle-replayable):
    - center on the per-dimension mean (rounded);
    - init w0 = the centered lowest-id vector, L2-normalized and
      rounded (no randomness — the kmeans lowest-id convention);
    - each pass: p = x_c . w (JVM fold, w inlined), then
      s_j = sum_rows(p * x_cj) via posexplode + ONE (pos)-keyed
      partial-aggregable sum, s rounded at the collect boundary, then
      w <- round(s / ||s||) on the driver (O(dim) state);
    - eigenvalue lambda = ||s|| / (n - 1) from the LAST pass (the
      Rayleigh quotient of the unit iterate), explained variance
      fraction = lambda / sum_j var_j.

    Returns one row per dimension: (pos, loading, eigenvalue,
    explained_var_frac) with the two scalars repeated per row (single
    hashable relation). Degenerate inputs (fewer than two rows, or a
    zero-variance corpus where every vector equals the mean) have no
    principal direction: the loadings come back NULL with eigenvalue
    0 — the NULL-on-degenerate convention the per-series operators
    use — rather than dividing by zero."""
    spark = df.sparkSession
    n = df.count()
    mu_rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg("x") + F.lit(1e-9), round_digits).alias("m"),
             F.var_samp("x").alias("v"))
        .collect()
    )
    mu_sorted = sorted(mu_rows, key=lambda r: r["pos"])
    mu = [r["m"] for r in mu_sorted]
    # pos-ordered sum: a fixed accumulation order keeps the driver-side
    # total deterministic across collect() partition orders
    total_var = sum((r["v"] or 0.0) for r in mu_sorted)

    def _degenerate():
        rows = [(i,) for i in range(len(mu))]
        return spark.createDataFrame(rows, "pos int").select(
            "pos",
            F.lit(None).cast("double").alias("loading"),
            F.lit(0.0).alias("eigenvalue"),
            F.lit(None).cast("double").alias("explained_var_frac"),
        )

    if n < 2 or total_var <= 0:
        return _degenerate()

    first = df.orderBy(id_col).select(
        _centered(df, vec_col, mu, round_digits).alias("c")
    ).first()["c"]
    nrm = math.sqrt(sum(x * x for x in first))
    if nrm == 0:
        # the lowest-id vector IS the mean: fall back to the first
        # basis direction (any unit vector works as a power-iteration
        # seed when the corpus has variance somewhere)
        w = [1.0] + [0.0] * (len(mu) - 1)
    else:
        w = [round(x / nrm + 1e-9, round_digits) for x in first]

    lam = 0.0
    for _ in range(iters):
        c = _centered(df, vec_col, mu, round_digits)
        warr = F.array(*[F.lit(float(x)) for x in w])
        p = F.round(
            F.aggregate(
                F.zip_with(c, warr, lambda x, y: x * y),
                F.lit(0.0), lambda a, x: a + x,
            ) + F.lit(1e-9),
            round_digits,
        )
        s_rows = (
            df.select(p.alias("_p"), F.posexplode(c).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.round(F.sum(F.col("_p") * F.col("x")) + F.lit(1e-9),
                         round_digits).alias("s"))
            .collect()
        )
        s = [r["s"] for r in sorted(s_rows, key=lambda r: r["pos"])]
        nrm = math.sqrt(sum(x * x for x in s))
        if nrm == 0:  # iterate annihilated (seed orthogonal to the data)
            return _degenerate()
        w = [round(x / nrm + 1e-9, round_digits) for x in s]
        lam = nrm / (n - 1)

    out = spark.createDataFrame(
        [(i, w[i]) for i in range(len(w))], "pos int, loading double"
    )
    return out.select(
        "pos", "loading",
        F.lit(round(lam + 1e-9, round_digits)).alias("eigenvalue"),
        F.lit(round(lam / total_var + 1e-9, round_digits))
        .alias("explained_var_frac"),
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-class embedding geometry: member count, centroid L2 norm,
    and the mean cosine similarity of members to their own centroid
    (intra-class cohesion) — the class-separation readout an embedding
    pipeline checks before trusting labels for SemDeDup buckets,
    contrastive sampling, or classifier features (cohesion near 0 =
    labels carry no geometry).

    Plan: posexplode -> ONE partial-aggregable groupBy building the
    per-(label, dim) component sums (map-side combine reduces each
    partition to labels*dim rows), then the member-side pass joins the
    BROADCAST centroid components back on (label, dim) and reduces
    per member, then per label — everything partial-aggregable, no
    per-row Python, centroid state is labels*dim rows no matter how
    many vectors. Sums are promoted to double once (float32 inputs)
    so both engines accumulate identical doubles."""
    from pyspark.sql.functions import broadcast

    comps = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = comps.groupBy("label", "dim").agg(
        F.avg("x").alias("c"), F.count("*").alias("_cnt")
    )
    member = (
        comps.join(broadcast(cent.select("label", "dim", "c")), ["label", "dim"])
        .groupBy("label", "_id")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("mn"),
        )
    )
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"),
        (F.first("_cnt")).cast("long").alias("n"),
    )
    cos = (
        member.join(broadcast(cnorm), "label")
        .select(
            "label", "n",
            F.when((F.col("mn") > 0) & (F.col("cn") > 0),
                   F.col("dot") / (F.col("mn") * F.col("cn"))).alias("cos"),
        )
    )
    return (
        cos.groupBy("label")
        .agg(
            F.first("n").alias("n"),
            F.round(F.avg("cos") + F.lit(1e-9), round_digits)
            .alias("mean_cos_to_centroid"),
        )
        .join(
            cnorm.select("label",
                         F.round(F.col("cn") + F.lit(1e-9), round_digits)
                         .alias("centroid_norm")),
            "label",
        )
        .select("label", "n", "centroid_norm", "mean_cos_to_centroid")
    )


def label_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Label-noise screening: the k members FARTHEST from their own
    label centroid, z-scored within the label — the standard
    mislabeled-example detector run before trusting labels for
    curation (a member several σ from its class centroid is either
    noise or label error).

    Distance comes from the same partial-aggregable sums as
    `label_centroids` (d² = Σx² - 2Σxc + Σc², with the labels×dim
    centroid relation broadcast), the per-label mean/σ of d from raw
    sums, so both engines round the identical z. Ranking is rounded z
    desc, then id asc; labels with zero distance spread emit nothing.

    Returns (label, rank, vec_id, dist, z)."""
    from pyspark.sql.functions import broadcast

    comps = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = comps.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    cnsq = cent.groupBy("label").agg(F.sum(F.col("c") * F.col("c")).alias("_cc"))
    member = (
        comps.join(broadcast(cent), ["label", "dim"])
        .groupBy("label", "_id")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("_xc"),
            F.sum(F.col("x") * F.col("x")).alias("_xx"),
        )
        .join(broadcast(cnsq), "label")
        .select(
            "label", "_id",
            F.sqrt(F.greatest(
                F.lit(0.0),
                F.col("_xx") - 2 * F.col("_xc") + F.col("_cc"),
            )).alias("_d"),
        )
    )
    stats = member.groupBy("label").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_d").alias("_sd"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sdd"),
    )
    n = F.col("_n")
    var = (F.col("_sdd") - F.col("_sd") * F.col("_sd") / n) / (n - 1)
    scored = (
        member.join(broadcast(stats), "label")
        .where((n >= 3) & (var > 0))
        .select(
            "label", "_id",
            F.round(F.col("_d") + F.lit(1e-9), round_digits).alias("dist"),
            F.round(
                (F.col("_d") - F.col("_sd") / n) / F.sqrt(var) + F.lit(1e-9),
                round_digits,
            ).alias("z"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("label").orderBy(F.col("z").desc(), F.col("_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("label", "rank", F.col("_id").alias(id_col), "dist", "z")
    )


def label_silhouette(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Centroid silhouette per label: for each member, a = distance to
    its own label centroid, b = distance to the NEAREST other label
    centroid, s = (b - a)/max(a, b) — the class-separation readout
    (mean s near 1 = tight and far from confusions, near 0 =
    boundaries overlap, negative = members sit closer to another
    class). Also reports the most-confused-with label (mode of each
    member's nearest-other centroid) — the pair a curation pipeline
    inspects first.

    Plan (the label_centroids/label_outliers discipline, no driver
    collect): component relation -> labels x dim centroid sums; the
    all-centroid distances come from ONE broadcast join of the
    centroid components on dim (the standard x k assignment fanout
    over the exploded relation — never a vector cartesian), reduced by
    partial-aggregable sums; everything after is member- or
    label-sized. d^2 = sum x^2 - 2 sum xc + sum c^2 with inputs and
    centroids rounded (kmeans discipline) and d^2 rounded before the
    sqrt, so argmin ties cannot flip between engines; nearest-other
    ties break to the lower label id via lexicographic struct min.

    Returns (label, n, mean_silhouette, confused_with, n_confused).
    """
    from pyspark.sql.functions import broadcast

    r6 = lambda c: F.round(c + F.lit(1e-9), round_digits)  # noqa: E731
    comps = df.select(
        F.col(label_col).cast("int").alias("own"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).withColumn("x", r6(F.col("x").cast("double")))
    cent = comps.groupBy(F.col("own").alias("lab2"), F.col("dim")).agg(
        r6(F.avg("x")).alias("c")
    )
    sxx = comps.groupBy("_id").agg(F.sum(F.col("x") * F.col("x")).alias("sxx"))
    scc = cent.groupBy("lab2").agg(F.sum(F.col("c") * F.col("c")).alias("scc"))
    sxc = (
        comps.join(broadcast(cent), "dim")
        .groupBy("_id", "own", "lab2")
        .agg(F.sum(F.col("x") * F.col("c")).alias("sxc"))
    )
    d = (
        sxc.join(sxx, "_id").join(broadcast(scc), "lab2")
        .select(
            "_id", "own", "lab2",
            r6(F.sqrt(F.greatest(
                F.round(F.col("sxx") - 2 * F.col("sxc") + F.col("scc")
                        + F.lit(1e-9), round_digits),
                F.lit(0.0)))).alias("d"),
        )
    )
    per_member = d.groupBy("_id", "own").agg(
        F.max(F.when(F.col("lab2") == F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("lab2") != F.col("own"),
                     F.struct(F.col("d"), F.col("lab2")))).alias("_b"),
    )
    a, b = F.col("a"), F.col("_b.d")
    s = r6(F.when(F.greatest(a, b) > 0, (b - a) / F.greatest(a, b))
           .otherwise(F.lit(0.0)))
    scored = per_member.select(
        F.col("own").alias("label"), s.alias("s"),
        F.col("_b.lab2").alias("nearest"),
    )
    sil = scored.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        r6(F.avg("s")).alias("mean_silhouette"),
    )
    mode = (
        scored.groupBy("label", "nearest")
        .agg(F.count("*").cast("long").alias("cnt"))
        .groupBy("label")
        .agg(F.max(F.struct(F.col("cnt"), (-F.col("nearest")).alias("nn")))
             .alias("_m"))
        .select("label", (-F.col("_m.nn")).cast("int").alias("confused_with"),
                F.col("_m.cnt").alias("n_confused"))
    )
    return sil.join(mode, "label").select(
        "label", "n", "mean_silhouette", "confused_with", "n_confused")
