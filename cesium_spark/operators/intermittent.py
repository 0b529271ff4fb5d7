"""Intermittent-demand analytics on zero-heavy event-count grids:
the Syntetos-Boylan ADI/CV² classification (Syntetos & Boylan 2005,
"On the categorization of demand patterns") and Croston's forecaster
with the SBA correction (Croston 1972; Syntetos & Boylan 2001).

Hourly event grids are naturally intermittent — most (key, hour)
buckets hold zero events — and the classical smoothers (`holt_linear`,
`seasonal_naive_backtest`) systematically over- or under-shoot on such
series. The standard practice is to FIRST classify each series into
the smooth / intermittent / erratic / lumpy quadrant, then route
intermittent ones to Croston-style size/interval smoothing instead of
level/trend smoothing. Both operators run on the same zero-filled
grid substrate as the rest of the forecast family
(`symbolic.hourly_count_grid`).

Scale shape: grid (one shuffle) → the non-zero demand subsequence per
key via one sort window → either raw-sum aggregates (profile) or a JVM
`aggregate` fold over the per-key demand array (Croston — array
bounded by the demand count ≤ time span, parallelism across keys).
Cross-engine determinism: per-step rounding in the fold (the
holt/kmeans replay discipline), rounded values at every classify/
compare boundary, round(x + 1e-9, 6) at the surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["intermittency_profile", "croston_forecast"]

# Syntetos-Boylan cutoffs
ADI_CUT = 1.32
CV2_CUT = 0.49


def _r6(col: Column, digits: int = 6) -> Column:
    return F.round(col + F.lit(1e-9), digits)


def _demands(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """(_k, _pos, _q, _s): the non-zero demand subsequence per key —
    1-based demand number, inter-demand interval (hours since previous
    demand; NULL for the first), and the demand size."""
    from .symbolic import hourly_count_grid

    g = hourly_count_grid(df, key_col, ts_col).where(F.col("_y") > 0)
    w = Window.partitionBy("_k").orderBy("_i")
    return g.select(
        "_k",
        F.row_number().over(w).alias("_pos"),
        (F.col("_i") - F.lag("_i", 1).over(w)).cast("double").alias("_q"),
        F.col("_y").alias("_s"),
    )


def intermittency_profile(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Syntetos-Boylan demand-pattern quadrant per series: ADI (mean
    inter-demand interval, hours) and CV² (squared coefficient of
    variation of the non-zero demand sizes), classified against the
    1.32 / 0.49 cutoffs into smooth / intermittent / erratic / lumpy —
    the routing decision between classical smoothing and Croston.

    ADI and CV² come from raw sums; the classification compares the
    ROUNDED statistics so both engines land in the same quadrant.
    Series need ≥ 2 demands (ADI undefined otherwise). Returns
    (key, n_hours, n_demands, adi, cv2, pattern)."""
    from .symbolic import hourly_count_grid

    g = hourly_count_grid(df, key_col, ts_col)
    hours = g.groupBy("_k").agg(F.count("*").cast("long").alias("n_hours"))
    d = _demands(df, key_col, ts_col)
    per = d.groupBy("_k").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_q").alias("_sq"),
        F.count("_q").cast("double").alias("_nq"),
        F.sum("_s").alias("_ss"),
        F.sum(F.col("_s") * F.col("_s")).alias("_sss"),
    )
    n, nq = F.col("_n"), F.col("_nq")
    adi = _r6(F.col("_sq") / nq, round_digits)
    mean_s = F.col("_ss") / n
    var_s = (F.col("_sss") - F.col("_ss") * F.col("_ss") / n) / (n - 1)
    cv2 = _r6(var_s / (mean_s * mean_s), round_digits)
    pattern = (
        F.when((adi < ADI_CUT) & (cv2 < CV2_CUT), "smooth")
        .when((adi >= ADI_CUT) & (cv2 < CV2_CUT), "intermittent")
        .when((adi < ADI_CUT) & (cv2 >= CV2_CUT), "erratic")
        .otherwise("lumpy")
    )
    return (
        per.where(nq >= 1)  # >= 2 demands -> at least one interval
        .join(hours, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n_hours",
            n.cast("long").alias("n_demands"),
            adi.alias("adi"),
            cv2.alias("cv2"),
            pattern.alias("pattern"),
        )
    )


def croston_forecast(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """Croston's intermittent-demand forecaster per series: separate
    exponential smoothing of the non-zero demand SIZES (z) and the
    inter-demand INTERVALS (p), demand-rate forecast z/p per hour,
    plus the Syntetos-Boylan approximately-unbiased correction
    (1 - α/2)·z/p. Initialization z = first demand's size, p = first
    observed interval (demand 2's); the recursion then consumes
    demands 3..n, updating on demand points ONLY — Croston's defining
    property. z and p are rounded each step (the holt/kmeans
    oracle-replay discipline).

    Series need ≥ 2 demands. Returns (key, n_demands, z, p,
    croston_rate, sba_rate)."""
    a1, a0 = float(alpha), round(1.0 - alpha, 12)
    d = _demands(df, key_col, ts_col)
    ser = (
        d.where(F.col("_pos") >= 2)  # rows that carry an interval
        .groupBy(F.col("_k").alias(key_col))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_q", "_s"))),
            lambda r: F.struct(r["_q"].alias("q"), r["_s"].alias("s")),
        ).alias("_dd"))
    )
    # first demand's size arrives separately (pos 1 has no interval row)
    first = (
        d.where(F.col("_pos") == 1)
        .select(F.col("_k").alias(key_col), F.col("_s").alias("_s1"))
    )
    ser = ser.join(first, key_col)

    def step(acc, e):
        z2 = F.round(F.lit(a1) * e["s"] + F.lit(a0) * acc["z"]
                     + F.lit(1e-9), round_digits)
        p2 = F.round(F.lit(a1) * e["q"] + F.lit(a0) * acc["p"]
                     + F.lit(1e-9), round_digits)
        return F.struct(z2.alias("z"), p2.alias("p"),
                        (acc["n"] + 1).alias("n"))

    # init on the FIRST demand's size and the FIRST interval, then fold
    # demands 2..n (the first array element provided the init interval,
    # so the fold starts at element 2 of _dd)
    init = F.struct(
        F.col("_s1").alias("z"),
        F.element_at("_dd", 1)["q"].alias("p"),
        F.lit(1).cast("long").alias("n"),
    )
    st = F.aggregate(
        F.slice("_dd", 2, F.greatest(F.size("_dd") - 1, F.lit(0))),
        init, step)
    rate = st["z"] / st["p"]
    return ser.select(
        key_col,
        (F.size("_dd") + 1).cast("long").alias("n_demands"),
        st["z"].alias("z"),
        st["p"].alias("p"),
        _r6(rate, round_digits).alias("croston_rate"),
        _r6(F.lit(1.0 - alpha / 2.0) * rate, round_digits).alias("sba_rate"),
    )
