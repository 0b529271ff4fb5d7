"""Nonparametric randomness tests per series: turning points, the
Wald-Wolfowitz runs test on median crossings, and the records test.

These are the distribution-free complements to `tsstats.ljung_box`
(which assumes the moment machinery of the ACF): each asks "is this
sequence exchangeable noise" from pure order statistics, so they stay
meaningful under the heavy tails and outliers event data actually has.

- turning points (Kendall 1962): count of strict local extrema; under
  i.i.d., E = 2(n-2)/3, Var = (16n - 29)/90.
- runs test (Wald & Wolfowitz 1940): runs above/below the series
  median (median-equal points dropped, the standard convention);
  under randomness E = 2 n1 n2/(n1+n2) + 1 with the classical
  variance; too few runs = positive dependence, too many = negative.
- records test (e.g. Foster & Stuart 1954): count of running-max and
  running-min records; under i.i.d. both have mean H_n = sum 1/k and
  variance H_n - H2_n (H2_n = sum 1/k^2) — excess high records call an
  upward trend from ranks alone. H_n is computed EXACTLY as the sum of
  1/row_number over the series (no closed-form approximation).

All three are one sort-shuffle per series (frames over the same
(ts, tiebreak) order) plus partial-aggregable groupBys; the runs test
adds one actor-sized join for the median. Comparisons run on the raw
input doubles (identical bits in both engines); only final statistics
round at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["turning_points", "runs_test", "record_stats"]

_Z = 1.96


def _r6(c):
    return F.round(c + F.lit(1e-9), 6)


def turning_points(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Kendall's turning-point test. A point is a turning point when
    it is a STRICT local max or min of its two neighbors (any tie
    disqualifies — the standard convention). Returns
    (key, n, n_turning, expected, z, random) with random in
    {'consistent', 'reject', 'insufficient'} (n < 3 is insufficient).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    x = F.col(value_col).cast("double")
    prev, nxt = F.lag(x, 1).over(w), F.lead(x, 1).over(w)
    is_tp = (
        prev.isNotNull() & nxt.isNotNull()
        & (((x > prev) & (x > nxt)) | ((x < prev) & (x < nxt)))
    )
    per = df.select(key_col, is_tp.alias("_tp")).groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("_tp"), 1)).cast("long").alias("n_turning"),
    )
    n = F.col("n")
    ok = n >= 3
    exp = 2.0 * (n - 2) / F.lit(3.0)
    var = (16.0 * n - 29) / F.lit(90.0)
    z = F.when(ok, _r6((F.col("n_turning") - exp) / F.sqrt(var)))
    return per.select(
        key_col, "n", "n_turning",
        F.when(ok, _r6(exp)).alias("expected"),
        z.alias("z"),
        F.when(~ok, F.lit("insufficient"))
        .when(F.abs(z) > _Z, F.lit("reject"))
        .otherwise(F.lit("consistent")).alias("random"),
    )


def runs_test(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Wald-Wolfowitz runs test on median crossings. Points equal to
    the per-series median (exact interpolated percentile) are dropped;
    the remaining above/below sequence's run count R is tested against
    the classical mean and variance. Returns
    (key, n_above, n_below, n_runs, z, random)."""
    x = F.col(value_col).cast("double")
    med = df.groupBy(F.col(key_col).alias("_mk")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med"))
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    signed = (
        df.join(med, F.col(key_col) == F.col("_mk"))
        .select(key_col, ts_col, tiebreak_col,
                F.when(x > F.col("_med"), F.lit(1))
                .when(x < F.col("_med"), F.lit(0)).alias("_s"))
        .where(F.col("_s").isNotNull())
        .select(key_col, "_s",
                (F.lag("_s", 1).over(w).isNull()
                 | (F.lag("_s", 1).over(w) != F.col("_s")))
                .alias("_new_run"))
    )
    per0 = signed.groupBy(key_col).agg(
        F.count(F.when(F.col("_s") == 1, 1)).cast("long").alias("_na"),
        F.count(F.when(F.col("_s") == 0, 1)).cast("long").alias("_nb"),
        F.count(F.when(F.col("_new_run"), 1)).cast("long").alias("_nr"),
    )
    # a fully-degenerate series (every point == its median) drops every
    # row above — re-anchor on the key universe so it still emits an
    # 'insufficient' row instead of vanishing
    per = med.select(F.col("_mk").alias(key_col)).join(
        per0, key_col, "left"
    ).select(
        key_col,
        F.coalesce("_na", F.lit(0)).cast("long").alias("n_above"),
        F.coalesce("_nb", F.lit(0)).cast("long").alias("n_below"),
        F.coalesce("_nr", F.lit(0)).cast("long").alias("n_runs"),
    )
    n1, n2, rr = F.col("n_above"), F.col("n_below"), F.col("n_runs")
    nn = n1 + n2
    # try_divide, not /: under ANSI the guard expression itself would
    # evaluate the division for a fully-degenerate key (nn = 0); NULL
    # moments then fail the > 0 gate exactly as DuckDB's NaN does
    exp = F.try_divide(2.0 * n1 * n2, nn) + 1
    var = F.try_divide(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2),
                       nn * nn * (nn - 1))
    ok = (n1 > 0) & (n2 > 0) & (nn > 1) & (var > 0)
    z = F.when(ok, _r6((rr - exp) / F.sqrt(var)))
    return per.select(
        key_col, "n_above", "n_below", "n_runs",
        z.alias("z"),
        F.when(~ok, F.lit("insufficient"))
        .when(F.abs(z) > _Z, F.lit("reject"))
        .otherwise(F.lit("consistent")).alias("random"),
    )


def record_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Records test: counts of strict running-max (high) and
    running-min (low) records, each tested against the i.i.d. law
    (mean H_n, variance H_n - H2_n, both computed EXACTLY from the
    series' own 1/k sums). Excess high records with deficient low
    records is an upward trend readable from ranks alone. Returns
    (key, n, n_high_records, n_low_records, expected, z_high, z_low,
    trend) with trend in {'increasing', 'decreasing', 'none',
    'insufficient'} (one-sided at 1.96 on the respective record
    excess; n < 2 is insufficient)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    x = F.col(value_col).cast("double")
    rn = F.row_number().over(w)
    hi = F.coalesce(x > F.max(x).over(w_prev), F.lit(True))
    lo = F.coalesce(x < F.min(x).over(w_prev), F.lit(True))
    staged = df.select(
        key_col, hi.alias("_hi"), lo.alias("_lo"),
        (F.lit(1.0) / rn).alias("_inv"),
        (F.lit(1.0) / (rn.cast("double") * rn)).alias("_inv2"),
    )
    per = staged.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("_hi"), 1)).cast("long")
        .alias("n_high_records"),
        F.count(F.when(F.col("_lo"), 1)).cast("long")
        .alias("n_low_records"),
        F.sum("_inv").alias("_hn"),
        F.sum("_inv2").alias("_h2n"),
    )
    ok = F.col("n") >= 2
    var = F.col("_hn") - F.col("_h2n")
    zh = F.when(ok & (var > 0),
                _r6((F.col("n_high_records") - F.col("_hn"))
                    / F.sqrt(var)))
    zl = F.when(ok & (var > 0),
                _r6((F.col("n_low_records") - F.col("_hn"))
                    / F.sqrt(var)))
    return per.select(
        key_col, "n", "n_high_records", "n_low_records",
        F.when(ok, _r6(F.col("_hn"))).alias("expected"),
        zh.alias("z_high"), zl.alias("z_low"),
        F.when(~ok, F.lit("insufficient"))
        .when((zh > _Z) & (zl < _Z), F.lit("increasing"))
        .when((zl > _Z) & (zh < _Z), F.lit("decreasing"))
        .otherwise(F.lit("none")).alias("trend"),
    )
