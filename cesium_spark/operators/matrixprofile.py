"""Relational matrix profile (Yeh et al., ICDM 2016) over hourly grids.

The matrix profile MP[i] is the z-normalized Euclidean distance from
subsequence i (length m) to its nearest non-trivial neighbor — the
one-structure answer to motif discovery (small MP) and discord /
anomaly detection (large MP). STAMP/STOMP are single-machine
O(n^2) algorithms with sequential state; this operator re-derives the
same quantity as pure relational algebra so Catalyst can distribute
it:

1. raw events collapse to the per-key hourly mean grid (ONE
   partial-aggregable groupBy; y rounded half-up at 6 decimals so
   both engines see identical doubles) and i = dense sequence index,
2. per-window moments from ONE ROWS frame (sum, sum of squares),
3. the O(n^2) dot-product relation is LAG-DECOMPOSED:
   y[t]*y[t+l] rows (self equi-join on the key, |i-j| >= exclusion
   zone) turn every sliding dot product into a ROWS-frame sum over t
   WITHIN (key, lag) — no per-cell recursion, so the whole profile is
   joins + window sums Spark executes with ordinary shuffles,
4. pair distances dist^2 = 2m(1 - (dot - m*mu_i*mu_j)/(m*sig_i*sig_j))
   are emitted in both directions and MP[i] = min(struct(dist, j)) —
   dist is rounded BEFORE the argmin so near-ties cannot flip engines
   (the label_silhouette idiom).

Scale contract: every O(n^2) relation lives on the GRID (n = span
hours, never event volume) — the same altitude mann_kendall /
theil_sen / leadlag_xcorr already use. n^2 rows per key shuffle once
for the (key, lag) window sums; at longer spans, band the lag range
(motifs/discords rarely need lags beyond a few thousand) or coarsen
the grid tier — both knobs compose with this plan unchanged. Flat
windows (sigma = 0) take the documented max(sig_i*sig_j, 1e-9) guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["matrix_profile"]

_EPS = 1e-9


def _r6(c):
    return F.round(c + F.lit(_EPS), 6)


def matrix_profile(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    m: int = 8,
    excl: int | None = None,
) -> DataFrame:
    """Full z-normalized matrix profile per key over the hourly grid:
    one row per valid window start — (key, i, hour, mp_dist, nn_i)
    where nn_i is the nearest-neighbor window start with
    |i - nn_i| >= excl (default ceil(m/2), the standard trivial-match
    exclusion zone). Window starts with NO neighbor outside the
    exclusion zone (only possible when n < m + 2*excl, i.e. a series
    barely longer than one window) emit no row — the relational
    spelling of the brute-force MP[i] = inf."""
    if excl is None:
        excl = max(1, (m + 1) // 2)
    hour_idx = (F.unix_micros(F.date_trunc("hour", F.col(ts_col)))
                / F.lit(3600e6)).cast("long")
    grid = (
        df.select(F.col(key_col), hour_idx.alias("h"),
                  F.col(value_col).alias("_v"))
        .groupBy(key_col, "h")
        .agg(_r6(F.avg("_v")).alias("y"))
    )
    wseq = Window.partitionBy(key_col).orderBy("h")
    grid = grid.select(
        key_col, "h", "y",
        (F.row_number().over(wseq) - 1).alias("i"),
    )
    # per-window moments: mean and std of the m-point window at i
    wf = Window.partitionBy(key_col).orderBy("i").rowsBetween(0, m - 1)
    st = (
        grid.select(
            key_col, "i", "h",
            F.count("*").over(wf).alias("_c"),
            F.sum("y").over(wf).alias("_s1"),
            F.sum(F.col("y") * F.col("y")).over(wf).alias("_s2"),
        )
        .where(F.col("_c") == m)
        .select(
            key_col, "i", "h",
            (F.col("_s1") / m).alias("mu"),
            # x*x, not pow(x, 2): pow's libm rounding is not pinned
            # across engines, the product is
            F.sqrt(F.greatest(
                F.col("_s2") / m - (F.col("_s1") / m) * (F.col("_s1") / m),
                F.lit(0.0),
            )).alias("sig"),
        )
    )
    # lag-decomposed products: one row per (t, t+l) grid-point pair
    a, b = grid.alias("a"), grid.alias("b")
    prod = a.join(
        b, (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
        & (F.col("b.i") >= F.col("a.i") + excl),
    ).select(
        F.col(f"a.{key_col}").alias(key_col),
        (F.col("b.i") - F.col("a.i")).alias("l"),
        F.col("a.i").alias("t"),
        (F.col("a.y") * F.col("b.y")).alias("p"),
    )
    wd = Window.partitionBy(key_col, "l").orderBy("t").rowsBetween(0, m - 1)
    dots = (
        prod.select(
            key_col, "l", F.col("t").alias("i"),
            F.sum("p").over(wd).alias("dot"),
            F.count("*").over(wd).alias("_c"),
        )
        .where(F.col("_c") == m)
        .select(key_col, "i", (F.col("i") + F.col("l")).alias("j"), "dot")
    )
    si, sj = st.alias("si"), st.alias("sj")
    corr = (
        (F.col("dot") - m * F.col("si.mu") * F.col("sj.mu"))
        / (m * F.greatest(F.col("si.sig") * F.col("sj.sig"), F.lit(1e-9)))
    )
    dist = F.sqrt(_r6(F.greatest(2.0 * m * (1.0 - corr), F.lit(0.0))))
    pairs = (
        dots.join(si, (F.col(f"si.{key_col}") == dots[key_col])
                  & (F.col("si.i") == dots["i"]))
        .join(sj, (F.col(f"sj.{key_col}") == dots[key_col])
              & (F.col("sj.i") == dots["j"]))
        .select(dots[key_col].alias(key_col), dots["i"].alias("i"),
                dots["j"].alias("j"), _r6(dist).alias("dist"))
    )
    sym = pairs.unionByName(
        pairs.select(key_col, F.col("j").alias("i"),
                     F.col("i").alias("j"), "dist")
    )
    mp = (
        sym.groupBy(key_col, "i")
        .agg(F.min(F.struct("dist", "j")).alias("s"))
        .select(key_col, "i", F.col("s.dist").alias("mp_dist"),
                F.col("s.j").alias("nn_i"))
    )
    return (
        mp.join(st.select(key_col, "i", "h"), [key_col, "i"])
        .select(key_col, F.col("i").cast("long").alias("i"),
                F.timestamp_seconds(F.col("h") * 3600).alias("hour"),
                "mp_dist", F.col("nn_i").cast("long").alias("nn_i"))
    )
