"""Product-analytics operators over event streams: weekly cohort
retention and rolling-quantile (Hampel-style) outlier flags.

These sit beside tsstats.py/robust.py on the monitoring tier above the
SURVEY §2.4 per-series blocks: "how do user cohorts retain week over
week" (the growth-analytics staple) and "which points sit outside the
series' own recent distribution" (the robust complement to
rolling_zscore_anomalies — quantile fences don't let the outlier
inflate the yardstick the way a mean/std does).

Plan discipline matches the sibling modules: JVM-only expressions, one
sort-shuffle per series for the windowed operator, partial-aggregable
groupBys plus broadcast-sized dimension joins for the cohort matrix,
and round(x + 1e-9, round_digits) on every emitted double. The
rolling quantiles are pure order statistics of raw doubles (no
accumulation), so Spark and DuckDB agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "hampel_outliers", "skew_report"]


def _r(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the ISO
    week (Monday-truncated, the shared Spark/DuckDB date_trunc rule) of
    their FIRST event; for each (cohort_week, weeks-since-cohort) cell,
    how many distinct cohort members were active, as a count and as a
    fraction of the cohort.

    Plan: per-user min(ts) is one partial-aggregable groupBy; joining
    it back onto events is a same-key equi-join (co-partitioned on the
    user key — both sides shuffle once on user_id and AQE plans the
    merge); the distinct (cohort, offset, user) dedup and the cell
    count are partial-aggregable; cohort sizes are a cohort-cardinality
    relation joined back by BROADCAST. Week offsets divide exactly
    (both operands are week-truncated), so the int cast is lossless.

    Returns (cohort_week, week_offset, n_active, cohort_size,
    retention_pct); offset 0 is the cohort week itself
    (retention_pct 1.0 by construction)."""
    first = (
        df.groupBy(key_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("_cohort"))
    )
    sizes = (
        first.groupBy("_cohort")
        .agg(F.count("*").cast("long").alias("cohort_size"))
    )
    cells = (
        df.select(F.col(key_col), F.date_trunc("week", F.col(ts_col)).alias("_wk"))
        .join(first, on=key_col)
        .select(
            "_cohort",
            (F.datediff(F.col("_wk"), F.col("_cohort")) / 7)
            .cast("int").alias("week_offset"),
            F.col(key_col),
        )
        .distinct()
        .groupBy("_cohort", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), on="_cohort")
        .select(
            F.col("_cohort").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            _r(
                F.col("n_active") / F.col("cohort_size"), round_digits
            ).alias("retention_pct"),
        )
    )


def hampel_outliers(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    window_rows: int = 25,
    k: float = 1.5,
    min_window: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """Rolling-quantile outlier flags (Hampel-style, IQR fences): a
    point is flagged when it sits more than k * IQR from the rolling
    median of its own trailing `window_rows` observations (median and
    quartiles computed over the frame INCLUDING the point — the
    streaming-friendly trailing formulation). Quantile fences are
    robust where rolling mean/std fences are not: a gross outlier
    entering the window barely moves the median, so it cannot mask
    itself or its neighbors.

    Points whose frame holds fewer than `min_window` observations are
    never flagged (quantiles of a near-empty frame are noise), and
    zero-IQR frames (locally constant series) are skipped rather than
    divided by.

    Plan: ONE sort-shuffle per series — all three rolling quantiles and
    the frame count come from the same Window frame, so Catalyst fuses
    them into a single Window node — then a map-only filter/projection.
    The quantiles are exact interpolated order statistics over raw
    doubles (rank p*(n-1), DuckDB's quantile_cont rule), deterministic
    across engines with no accumulation-order concerns.

    Returns flagged rows only: (key, ts, tiebreak, value, med, iqr,
    score) with score = |value - med| / iqr."""
    frame = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    x = F.col(value_col).cast("double")
    med = F.percentile(x, F.lit(0.5)).over(frame)
    q25 = F.percentile(x, F.lit(0.25)).over(frame)
    q75 = F.percentile(x, F.lit(0.75)).over(frame)
    base = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        x.alias("_x"),
        med.alias("_med"),
        (q75 - q25).alias("_iqr"),
        F.count("*").over(frame).alias("_nw"),
    )
    dev = F.abs(F.col("_x") - F.col("_med"))
    return (
        base.where(
            (F.col("_nw") >= min_window)
            & (F.col("_iqr") > 0)
            & (dev > F.lit(k) * F.col("_iqr"))
        )
        .select(
            key_col,
            ts_col,
            tiebreak_col,
            F.col("_x").alias(value_col),
            _r(F.col("_med"), round_digits).alias("med"),
            _r(F.col("_iqr"), round_digits).alias("iqr"),
            _r(dev / F.col("_iqr"), round_digits).alias("score"),
        )
    )


def skew_report(
    df: DataFrame,
    key_col: str = "user_id",
    top_n: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Partition-planning skew profile of a key: ONE summary row with
    the key cardinality, row total, max/mean/p99 per-key counts,
    coefficient of variation, Gini coefficient of the count
    distribution, and the row share of the top_n heaviest keys — the
    numbers that decide whether a join/groupBy on this key needs
    salting, AQE skew splitting, or a broadcast route.

    Gini uses the rank formulation over counts ascending (ties broken
    on the key for determinism): G = 2*sum(i*c_i)/(n*sum(c)) - (n+1)/n.

    Plan: the per-key count is one partial-aggregable groupBy; every
    later step runs on the KEY-CARDINALITY relation, not the rows —
    one sort (the rank window) plus single-row reduces. At extreme key
    cardinality the sort is the cost; sample the count relation first
    if an estimate suffices (the summary is diagnostics, not lineage).

    Returns (n_keys, n_rows, max_count, mean_count, p99_count, cv,
    gini, top{top_n}_share)."""
    counts = df.groupBy(key_col).agg(F.count("*").cast("long").alias("_c"))
    w_asc = Window.orderBy(F.col("_c"), F.col(key_col))
    w_desc = Window.orderBy(F.col("_c").desc(), F.col(key_col))
    ranked = counts.select(
        "_c",
        F.row_number().over(w_asc).alias("_i"),
        F.row_number().over(w_desc).alias("_j"),
    )
    n = F.count("*").cast("long")
    tot = F.sum("_c")
    mean = tot / n
    # population std via co-moments (identical expansion in the oracle)
    var = F.sum(F.col("_c") * F.col("_c")) / n - mean * mean
    gini = (
        F.lit(2.0) * F.sum(F.col("_i") * F.col("_c")) / (n * tot)
        - (n + F.lit(1.0)) / n
    )
    top_share = (
        F.sum(F.when(F.col("_j") <= top_n, F.col("_c")).otherwise(0)) / tot
    )
    return ranked.agg(
        n.alias("n_keys"),
        tot.cast("long").alias("n_rows"),
        F.max("_c").alias("max_count"),
        _r(mean, round_digits).alias("mean_count"),
        _r(F.percentile(F.col("_c").cast("double"), F.lit(0.99)),
           round_digits).alias("p99_count"),
        _r(F.sqrt(F.greatest(var, F.lit(0.0))) / mean,
           round_digits).alias("cv"),
        _r(gini, round_digits).alias("gini"),
        _r(top_share, round_digits).alias(f"top{top_n}_share"),
    )
