"""Robust / weighted per-series estimators over event streams: EWMA
level+volatility, Theil-Sen trend, exact interpolated percentiles, and
cross-series correlation between per-type hourly series.

These extend the SURVEY §2.4 scalar blocks (cesium's per-series
features, `cesium/features/graphs.py:215-359`) with the
robust-statistics tier an operations pipeline layers on top of the
same rolled-up series: "what is the series' current exponentially-
weighted level and volatility" (RiskMetrics EWMA), "what is its trend
if outliers can't be trusted" (Theil-Sen, the standard robust
complement to the OLS `series_trend`), "what are the tail quantiles
per group" and "which event-type series move together".

Plan discipline matches tsstats.py: every operator is JVM-expression
only (no Python in the hot path), at most one sort-shuffle per series
plus partial-aggregable groupBys, and every emitted double is
round(x + 1e-9, round_digits) so the DuckDB oracles replay
hash-exactly. Theil-Sen is the one intrinsically quadratic estimator
here; its pair relation is bounded per-series by the deterministic
`max_points` decimation (stride-sampling by row number, replayed
verbatim in the oracle), so the blow-up is capped at
max_points^2/2 pairs per series no matter how long the raw series —
the knob that keeps the operator viable on web-scale series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ewma_level", "theilsen_trend", "value_percentiles", "xcorr_types",
    "theilsen_ci",
]


def _r(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def _t_days(ts_col: str, t0: str):
    """Timestamp axis in days since t0 (same re-basing rationale as
    series_trend: epoch-origin intercepts would demand ~5e-11 relative
    precision for 6-decimal cross-engine agreement)."""
    return (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.lit(t0).cast("timestamp"))
    ) / F.lit(86400e6)


def ewma_level(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """Exponentially-weighted level and volatility of each series "as of
    now": the newest observation gets weight 1, each step into the past
    decays by (1-alpha)  — pandas `ewm(alpha=...).mean()` (adjust=True)
    evaluated at the series' last point, plus the matching weighted
    standard deviation (RiskMetrics-style EWMA volatility).

        level = sum_j (1-a)^(n-j) x_j / sum_j (1-a)^(n-j)   (j = 1..n)
        vol   = sqrt(max(0, weighted E[x^2] - level^2))

    Weights are position-based (row number within the series ordered by
    ts/tiebreak), so irregular cadence decays per OBSERVATION, not per
    unit time — the estimator every streaming monitoring stack keeps
    per key. Old points underflow pow() to 0.0 gracefully, so unbounded
    series never overflow.

    Plan: one sort-shuffle per series (a single Window for row_number +
    count), then a partial-aggregable groupBy — no Python, no collect.
    Variances below 1e-9 clamp to exact 0 before the sqrt (cancellation
    noise on a constant series is ~1e-12*x^2, which sqrt would amplify
    straight into the 6th decimal; the clamp keeps both engines on the
    same side). NULL values are dropped BEFORE weighting (pandas ewm
    renormalizes over observed points; keeping a NULL row's weight in
    the denominator would bias the level toward 0), so n counts
    observed points only.

    Returns (key, n, ewma, ewm_std)."""
    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wn = Window.partitionBy(key_col)
    x = F.col(value_col).cast("double")
    weighted = df.select(
        F.col(key_col),
        x.alias("_x"),
        F.pow(
            F.lit(1.0 - alpha),
            (F.count("*").over(wn) - F.row_number().over(w)).cast("double"),
        ).alias("_w"),
    )
    sw = F.sum("_w")
    mean = F.sum(F.col("_w") * F.col("_x")) / sw
    ex2 = F.sum(F.col("_w") * F.col("_x") * F.col("_x")) / sw
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))
    var = F.when(var < 1e-9, F.lit(0.0)).otherwise(var)
    return weighted.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        _r(mean, round_digits).alias("ewma"),
        _r(F.sqrt(var), round_digits).alias("ewm_std"),
    )


def theilsen_trend(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    t0: str = "2024-01-01",
    max_points: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend per series: slope = median of all pairwise
    slopes (value per DAY), intercept = median of (x_i - slope * t_i) at
    t0 — the standard high-breakdown (29%) complement to the OLS
    `series_trend`, immune to the outliers OLS chases.

    Scale path: the pair relation is quadratic per series, so series
    longer than `max_points` are first DECIMATED deterministically —
    keep rows where (rn-1) % stride == 0 with stride = ceil(n /
    max_points), rn ordered by (ts, tiebreak). The stride rule is pure
    arithmetic on row numbers, so the DuckDB oracle replays it
    verbatim; the quadratic cost is capped at max_points^2/2 pairs per
    series regardless of raw length (Theil-Sen on an evenly decimated
    subsample is the textbook large-n fallback).

    Plan: one Window for (rn, n), a same-key self-join (co-partitioned,
    AQE-planned — both sides shuffle on the series key once), a
    partial+final median per key, then a broadcast join of the tiny
    per-key slope relation back onto the decimated points for the
    intercept median. Equal-timestamp pairs are excluded (undefined
    slope) in both engines.

    Returns (key, n_used, n_pairs, slope_per_day, intercept); series
    with no strictly-ordered pair yield NULL slope/intercept."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wn = Window.partitionBy(key_col)
    stride = F.greatest(
        F.ceil(F.count("*").over(wn) / F.lit(max_points)), F.lit(1)
    )
    pts = (
        df.select(
            F.col(key_col),
            _t_days(ts_col, t0).alias("_t"),
            F.col(value_col).cast("double").alias("_x"),
            F.row_number().over(w).alias("_rn"),
            stride.alias("_stride"),
        )
        .where((F.col("_rn") - 1) % F.col("_stride") == 0)
        .drop("_rn", "_stride")
    )
    a = pts.select(F.col(key_col), F.col("_t").alias("_t1"), F.col("_x").alias("_x1"))
    b = pts.select(F.col(key_col), F.col("_t").alias("_t2"), F.col("_x").alias("_x2"))
    pairs = a.join(b, on=key_col).where(F.col("_t2") > F.col("_t1"))
    slopes = pairs.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile((_x2 - _x1) / (_t2 - _t1), 0.5)").alias("_slope"),
    )
    # the left join preserves exactly one row per decimated point, so
    # n_used is just count(*) here — no separate `used` relation/join
    return (
        pts.join(F.broadcast(slopes), on=key_col, how="left")
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_used"),
            F.first("n_pairs").alias("_np"),
            F.first("_slope").alias("_s"),
            F.expr("percentile(_x - _slope * _t, 0.5)").alias("_icept"),
        )
        .select(
            key_col,
            "n_used",
            F.coalesce(F.col("_np"), F.lit(0)).cast("long").alias("n_pairs"),
            _r(F.col("_s"), round_digits).alias("slope_per_day"),
            _r(F.col("_icept"), round_digits).alias("intercept"),
        )
    )


def value_percentiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Exact interpolated percentiles per group — the tail-latency
    report (p50/p90/p99) every monitoring pipeline publishes. Uses the
    exact `percentile` aggregate (linear interpolation at rank
    p*(n-1)), NOT approx_percentile: the sketch's answer depends on
    partitioning, the exact aggregate's doesn't, and DuckDB's
    quantile_cont shares the interpolation rule bit-for-bit.

    Exactness costs a per-group sort inside the aggregate — the right
    trade for dashboard-tier group cardinalities (thousands of groups).
    For billion-key cardinalities swap in approx_percentile and drop
    the oracle to a tolerance check; the operator keeps the exact
    default because its output is the contract.

    Returns (group, n, p50, p90, ... one column per requested p)."""
    x = F.col(value_col).cast("double")
    aggs = [F.count("*").cast("long").alias("n")]
    for p in ps:
        # %g: 0.99*100 is 98.99999999999999 in binary floats -> "99"
        label = "p" + ("%g" % (p * 100)).replace(".", "_")
        aggs.append(_r(F.percentile(x, F.lit(p)), round_digits).alias(label))
    return df.groupBy(group_col).agg(*aggs)


def xcorr_types(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    min_hours: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Cross-correlation between event-type series within each key:
    align every type's hourly sum onto the shared hourly grid, then
    Pearson-correlate each type pair over the hours where BOTH types
    observed data (inner-join semantics — co-absence carries no
    signal). The monitoring question this answers: "which signals of
    this user move together?".

    The correlation is expanded from raw co-moment sums rather than the
    native corr() so zero-variance guards are explicit and identical in
    both engines (native corr returns NaN in Spark vs NULL in DuckDB on
    degenerate input — the r4 NULL-parity lesson).

    Plan: partial-aggregable hourly rollup (one shuffle), same-key
    self-join on (key, hour) with type_a < type_b (co-partitioned), and
    a final partial-aggregable groupBy — all JVM.

    Returns (key, type_a, type_b, n_hours, corr); pairs sharing fewer
    than `min_hours` common hours are dropped, zero-variance pairs
    emit NULL corr."""
    hourly = (
        df.groupBy(
            F.col(key_col),
            F.date_trunc("hour", F.col(ts_col)).alias("_h"),
            F.col(type_col),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("_s"))
        # an all-NULL hour sums to NULL: drop it BEFORE pairing — the
        # co-moment sums would skip it while count(*) kept it in
        # n_hours, yielding a mathematically invalid correlation
        .where(F.col("_s").isNotNull())
    )
    a = hourly.select(
        F.col(key_col), "_h",
        F.col(type_col).alias("type_a"), F.col("_s").alias("_sa"),
    )
    b = hourly.select(
        F.col(key_col), "_h",
        F.col(type_col).alias("type_b"), F.col("_s").alias("_sb"),
    )
    pairs = a.join(b, on=[key_col, "_h"]).where(F.col("type_a") < F.col("type_b"))
    per = pairs.groupBy(key_col, "type_a", "type_b").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("_sa").alias("_ea"),
        F.sum("_sb").alias("_eb"),
        F.sum(F.col("_sa") * F.col("_sb")).alias("_eab"),
        F.sum(F.col("_sa") * F.col("_sa")).alias("_eaa"),
        F.sum(F.col("_sb") * F.col("_sb")).alias("_ebb"),
    )
    n = F.col("n_hours").cast("double")
    cov = n * F.col("_eab") - F.col("_ea") * F.col("_eb")
    va = n * F.col("_eaa") - F.col("_ea") * F.col("_ea")
    vb = n * F.col("_ebb") - F.col("_eb") * F.col("_eb")
    corr = F.when(
        (va > 1e-9) & (vb > 1e-9), _r(cov / F.sqrt(va * vb), round_digits)
    ).otherwise(F.lit(None).cast("double"))
    return (
        per.where(F.col("n_hours") >= min_hours)
        .select(key_col, "type_a", "type_b", "n_hours", corr.alias("corr"))
    )


def theilsen_ci(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    t0: str = "2024-01-01",
    max_points: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Sen's confidence interval for the Theil-Sen slope (Sen 1968;
    Gilbert 1987 §16.5): the CI endpoints are ORDER STATISTICS of the
    pairwise-slope relation — lower = the M1-th smallest slope and
    upper = the M2-th, with M1 = (N - c)/2 and M2 = (N + c)/2 + 1,
    c = 1.96 sqrt(Var(S)), Var(S) = n(n-1)(2n+5)/18 (the untied form;
    value ties in a continuous amount column are measure-thin and the
    normal approximation dominates any tie correction at these n).
    Ranks are clamped to [1, N]; both rank computations round the
    (N +/- c)/2 double at 6 before floor/ceil so the engines pick the
    same order statistic.

    Same decimation + pair plan as theilsen_trend (quadratic work
    capped at max_points^2/2 per series); ranking the slope relation
    adds one sort over the pairs, and equal slopes make the selected
    VALUE rank-order-insensitive. Returns (key, n_used, n_pairs,
    slope_per_day, ci_lo, ci_hi); series with no strictly-ordered pair
    yield NULLs.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wn = Window.partitionBy(key_col)
    stride = F.greatest(
        F.ceil(F.count("*").over(wn) / F.lit(max_points)), F.lit(1)
    )
    pts = (
        df.select(
            F.col(key_col),
            _t_days(ts_col, t0).alias("_t"),
            F.col(value_col).cast("double").alias("_x"),
            F.row_number().over(w).alias("_rn"),
            stride.alias("_stride"),
        )
        .where((F.col("_rn") - 1) % F.col("_stride") == 0)
        .drop("_rn", "_stride")
    )
    a = pts.select(F.col(key_col), F.col("_t").alias("_t1"),
                   F.col("_x").alias("_x1"))
    b = pts.select(F.col(key_col), F.col("_t").alias("_t2"),
                   F.col("_x").alias("_x2"))
    pairs = (
        a.join(b, on=key_col).where(F.col("_t2") > F.col("_t1"))
        .select(key_col,
                ((F.col("_x2") - F.col("_x1"))
                 / (F.col("_t2") - F.col("_t1"))).alias("_slope"))
    )
    ranked = pairs.select(
        key_col, "_slope",
        F.row_number().over(
            Window.partitionBy(key_col).orderBy("_slope")).alias("_rk"),
    )
    nu = pts.groupBy(key_col).agg(F.count("*").cast("long").alias("n_used"))
    n = F.col("n_used").cast("double")
    c = F.lit(1.96) * F.sqrt(n * (n - 1) * (2 * n + 5) / F.lit(18.0))
    big_n = F.col("n_pairs")
    meta = (
        nu.join(pairs.groupBy(key_col)
                .agg(F.count("*").cast("long").alias("n_pairs"),
                     F.expr("percentile(_slope, 0.5)").alias("_med")),
                key_col, "left")
        .select(
            key_col, "n_used",
            F.coalesce(big_n, F.lit(0)).cast("long").alias("n_pairs"),
            F.col("_med"),
            F.greatest(F.lit(1), F.floor(F.round(
                (big_n - c) / 2 + F.lit(1e-9), 6)).cast("long"))
            .alias("_lo_rk"),
            F.least(big_n, (F.ceil(F.round(
                (big_n + c) / 2 + F.lit(1e-9), 6)) + 1).cast("long"))
            .alias("_hi_rk"),
        )
    )
    lo = ranked.select(F.col(key_col).alias("_lk"), F.col("_rk").alias("_lr"),
                       F.col("_slope").alias("_lo_slope"))
    hi = ranked.select(F.col(key_col).alias("_hk"), F.col("_rk").alias("_hr"),
                       F.col("_slope").alias("_hi_slope"))
    out = (
        meta
        .join(lo, (F.col(key_col) == F.col("_lk"))
              & (F.col("_lo_rk") == F.col("_lr")), "left")
        .join(hi, (F.col(key_col) == F.col("_hk"))
              & (F.col("_hi_rk") == F.col("_hr")), "left")
    )
    return out.select(
        key_col, "n_used", "n_pairs",
        _r(F.col("_med"), round_digits).alias("slope_per_day"),
        _r(F.col("_lo_slope"), round_digits).alias("ci_lo"),
        _r(F.col("_hi_slope"), round_digits).alias("ci_hi"),
    )
