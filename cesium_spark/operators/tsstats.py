"""Per-series time-series diagnostics over event streams: sample
autocorrelation, CUSUM changepoint location, rolling-window z-score
anomaly flags.

These extend the SURVEY §2.4 feature blocks (cesium's per-series
scalar features, `cesium/features/graphs.py`) with the monitoring-tier
diagnostics an operations pipeline runs over the SAME rolled-up
series: "is this series autocorrelated", "where did its level shift",
"which points are locally anomalous". All three are expressed with
one sort-shuffle per series (a single Window partition by the series
key) plus JVM window/aggregate expressions — no Python in the hot
path, no per-series collect, and the per-series state never leaves
the executors.

Cross-engine determinism follows the repo discipline: every emitted
double is round(x + 1e-9, 6), and any argmax/argmin tie is broken on
the ROUNDED value then the earliest position, so the DuckDB oracles
replay hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "acf_lags", "cusum_changepoint", "rolling_zscore_anomalies",
    "series_trend", "hod_profile", "drawdown_stats",
    "burst_stats", "coverage_report", "winsorize_series",
    "seasonal_decompose", "event_transitions", "event_trigrams",
    "hourly_peaks", "seasonal_anomalies", "type_entropy", "decorrelation_lag",
    "seasonal_naive_backtest", "leadlag_xcorr", "holt_linear", "ar1_fit",
    "seasonal_strength", "peak_rate", "binseg_changepoints", "ljung_box",
    "holt_winters", "spearman_types", "kalman_level", "pacf_lags",
    "effective_sample_size", "model_id", "seasonal_naive_interval",
]


def _r6(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def acf_lags(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Sample autocorrelation function per series at lags 1..max_lag.

    Uses the standard biased sample-ACF estimator (Box & Jenkins):
    r_L = sum_{t=1..n-L} (x_t - xbar)(x_{t+L} - xbar)
          / sum_{t=1..n} (x_t - xbar)^2
    with xbar and the denominator over the FULL series, which is what
    statsmodels/R `acf` compute — not a per-lag Pearson over the
    overlapping pairs.

    Returns (key, lag, n_pairs, acf); series whose variance is zero
    (or with n <= lag) emit NULL acf for that lag. Plan shape: ONE
    sort-shuffle per series — all max_lag lagged columns come from the
    same Window (partition key, order ts/tiebreak), so Catalyst fuses
    them into a single Window node; the per-(key,lag) sums are a
    partial-aggregable groupBy; lags unpivot via stack, map-only.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    x = F.col(value_col).cast("double")
    lagged = df.select(
        key_col,
        x.alias("_x"),
        *[F.lag(x, L).over(w).alias(f"_x_lag{L}") for L in range(1, max_lag + 1)],
    )
    # per-series mean/denominator plus the per-lag cross products, all
    # in one partial-aggregable pass; the lag-L product term uses the
    # series mean, so compute sums first and expand the centered form:
    # sum((x_t - m)(x_{t+L} - m)) = sum(x_t * x_{t+L}) - m*sum(x_t head)
    #                               - m*sum(x_{t+L} tail) + c_L*m^2
    aggs = [
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    ]
    for L in range(1, max_lag + 1):
        xl = F.col(f"_x_lag{L}")
        pair = xl.isNotNull()
        aggs += [
            F.count(F.when(pair, 1)).alias(f"_c{L}"),
            F.sum(F.when(pair, F.col("_x") * xl)).alias(f"_sp{L}"),
            F.sum(F.when(pair, F.col("_x"))).alias(f"_scur{L}"),
            F.sum(F.when(pair, xl)).alias(f"_slag{L}"),
        ]
    per = lagged.groupBy(key_col).agg(*aggs)

    m = F.col("_sx") / F.col("_n")
    denom = F.col("_sxx") - F.col("_n") * m * m
    stacked_cols = []
    for L in range(1, max_lag + 1):
        num = (
            F.col(f"_sp{L}")
            - m * F.col(f"_scur{L}")
            - m * F.col(f"_slag{L}")
            + F.col(f"_c{L}") * m * m
        )
        acf = F.when(
            (denom > 0) & (F.col(f"_c{L}") > 0), _r6(num / denom)
        ).otherwise(F.lit(None).cast("double"))
        stacked_cols += [
            F.lit(L),
            F.coalesce(F.col(f"_c{L}"), F.lit(0)).cast("long"),
            acf,
        ]
    # unpivot map-only via explode of an inline array of structs (the
    # stack() equivalent, but built from Column objects directly)
    rows = F.array(
        *[
            F.struct(
                stacked_cols[3 * i].cast("int").alias("lag"),
                stacked_cols[3 * i + 1].alias("n_pairs"),
                stacked_cols[3 * i + 2].alias("acf"),
            )
            for i in range(max_lag)
        ]
    )
    return (
        per.select(key_col, F.explode(rows).alias("_r"))
        .select(key_col, "_r.lag", "_r.n_pairs", "_r.acf")
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Single changepoint estimate per series via the CUSUM statistic
    (Page 1954 / the standardized form in Taylor's changepoint
    bootstrap): S_t = sum_{i<=t} (x_i - xbar), the estimated change
    location is argmax_t |S_t| and the reported statistic is
    max|S_t| / (sd * sqrt(n)) — scale-free, comparable across series.

    Returns (key, n, cp_pos, cp_stat) with cp_pos the 1-based position
    of the max-|S| point in (ts, tiebreak) order; ties on the ROUNDED
    |S| break to the earliest position (cross-engine determinism).
    Series with zero variance or n < 2 emit NULL cp_pos/cp_stat.

    One sort-shuffle per series: the running sum and row position come
    from the same Window; the argmax is a struct-min aggregate (no
    second window, no per-series collect).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    x = F.col(value_col).cast("double")
    stats_w = Window.partitionBy(key_col)
    base = df.select(
        key_col,
        x.alias("_x"),
        F.row_number().over(w).alias("_pos"),
        F.sum(x).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.count("*").over(stats_w).alias("_n"),
        F.avg(x).over(stats_w).alias("_mean"),
        F.stddev_samp(x).over(stats_w).alias("_sd"),
    )
    # S_t = cumsum(x) - t * mean  (identical to summing centered values)
    s_abs = F.abs(F.col("_cum") - F.col("_pos") * F.col("_mean"))
    # argmax on (rounded |S| desc, pos asc) as a struct-min
    pick = F.struct(
        (-_r6(s_abs)).alias("_neg"), F.col("_pos").alias("_pos")
    )
    per = base.groupBy(key_col).agg(
        F.max("_n").alias("n"),
        F.min(pick).alias("_best"),
        F.max(_r6(s_abs)).alias("_smax_r"),
        F.max(s_abs).alias("_smax"),
        F.max("_sd").alias("_sd"),
    )
    ok = (F.col("n") >= 2) & (F.col("_sd") > 0)
    return per.select(
        key_col,
        F.col("n").cast("long").alias("n"),
        F.when(ok, F.col("_best._pos")).cast("long").alias("cp_pos"),
        F.when(
            ok, _r6(F.col("_smax") / (F.col("_sd") * F.sqrt(F.col("n"))))
        ).alias("cp_stat"),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    window: int = 20,
    min_points: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly detection: each point is scored against
    the `window` points strictly BEFORE it in its own series —
    z = (x_t - mean(prev W)) / stddev_samp(prev W) — and flagged when
    |z| > threshold. Using only preceding points keeps the score causal
    (the streaming-monitor semantics) and means an anomaly does not
    contaminate its own baseline.

    Returns the flagged rows only: (key, ts, tiebreak, value, n_base,
    z), z rounded to 6dp. Points with fewer than min_points
    predecessors or a zero-variance baseline are never flagged.
    Plan: one sort-shuffle per series; mean/std/count share a single
    ROWS-frame Window; the flag is a map-side filter, so the output
    relation is anomaly-sized, not corpus-sized.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col).cast("double")
    scored = df.select(
        key_col,
        ts_col,
        tiebreak_col,
        x.alias("_x"),
        F.count("*").over(w).alias("_nb"),
        F.avg(x).over(w).alias("_m"),
        F.stddev_samp(x).over(w).alias("_sd"),
    )
    z = _r6((F.col("_x") - F.col("_m")) / F.col("_sd"))
    return (
        scored.filter(
            (F.col("_nb") >= min_points)
            & (F.col("_sd") > 0)
        )
        .select(
            key_col,
            ts_col,
            tiebreak_col,
            F.col("_x").alias(value_col),
            F.col("_nb").cast("long").alias("n_base"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > threshold)
    )


def series_trend(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    t0: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series OLS trend: slope/intercept (value per DAY) and R^2 via
    the native regr_* aggregates — JVM-side, partial-aggregable, one
    shuffle on the series key, no window at all. Spark and DuckDB share
    the regr_slope/regr_intercept/regr_r2 definitions, so the oracle
    replays them verbatim.

    `t0` (an ISO timestamp string for timestamp axes, a number for
    numeric axes — numeric axes keep their own unit) re-bases the
    time axis so the
    intercept is "fitted value at t0" — pass a date near the data.
    With the default epoch origin the intercept's magnitude is
    |slope| * days-since-1970 (~2e4), where 6-decimal cross-engine
    agreement would demand ~5e-11 relative precision from two
    different co-moment accumulation orders; re-based, it is
    value-sized and rounds identically.

    Returns (key, n, slope_per_day, intercept, r2); single-point or
    zero-time-variance series yield NULL slope/r2 (both engines).
    """
    if dict(df.dtypes)[ts_col] in ("double", "float", "bigint", "int"):
        # numeric axis: slope is per ts-unit; t0 (a number here) re-bases
        # the intercept the same way it does for timestamps
        t_days = F.col(ts_col).cast("double")
        if t0 is not None:
            t_days = t_days - F.lit(float(t0))
    else:
        t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        if t0 is not None:
            t_us = t_us - F.unix_micros(F.lit(t0).cast("timestamp"))
        t_days = t_us / F.lit(86400e6)
    x = F.col(value_col).cast("double")
    return (
        df.select(F.col(key_col), t_days.alias("_t"), x.alias("_x"))
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            _r6(F.expr("regr_slope(_x, _t)"), round_digits).alias("slope_per_day"),
            _r6(F.expr("regr_intercept(_x, _t)"), round_digits).alias("intercept"),
            _r6(F.expr("regr_r2(_x, _t)"), round_digits).alias("r2"),
        )
    )


def hod_profile(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Seasonality fingerprint: per (series, day-of-week, hour-of-day)
    count / mean / sample-std of the value — the weekly-hourly profile a
    monitoring pipeline baselines against (and the reference's cadence
    features never had, being astronomy-cadenced). One partial-
    aggregable groupBy; dow is normalized to 0=Sunday in both engines
    (Spark dayofweek()-1 == DuckDB dayofweek()).

    Returns (key, dow, hour, n, mean, std)."""
    x = F.col(value_col).cast("double")
    return (
        df.select(
            F.col(key_col),
            (F.dayofweek(ts_col) - 1).cast("int").alias("dow"),
            F.hour(ts_col).cast("int").alias("hour"),
            x.alias("_x"),
        )
        .groupBy(key_col, "dow", "hour")
        .agg(
            F.count("*").cast("long").alias("n"),
            _r6(F.avg("_x"), round_digits).alias("mean"),
            _r6(F.stddev_samp("_x"), round_digits).alias("std"),
        )
    )


def drawdown_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-series peak-to-trough stress statistics in (ts, tiebreak)
    order: max_drawdown = max_t(running_max - x_t), its mirror
    max_drawup = max_t(x_t - running_min), and net_change = last - first
    — the monitoring triple for "how far did this series fall from its
    best point". Running extrema come from ONE cumulative ROWS window;
    the reduction is a groupBy sharing the same partitioning, so the
    plan is one Exchange + one Window + final aggregate. Pure max/min/
    subtract arithmetic — no accumulation-order float risk, so the
    oracle replays it exactly.

    Returns (key, n, peak, trough, max_drawdown, max_drawup,
    net_change)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col).cast("double")
    run_max = F.max(x).over(w)
    run_min = F.min(x).over(w)
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    )
    base = df.select(
        F.col(key_col), x.alias("_x"),
        (run_max - x).alias("_dd"), (x - run_min).alias("_du"),
        rn.alias("_pos"),
    )
    return base.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        _r6(F.max("_x"), round_digits).alias("peak"),
        _r6(F.min("_x"), round_digits).alias("trough"),
        _r6(F.max("_dd"), round_digits).alias("max_drawdown"),
        _r6(F.max("_du"), round_digits).alias("max_drawup"),
        _r6(F.max_by("_x", "_pos") - F.min_by("_x", "_pos"),
            round_digits).alias("net_change"),
    )


def burst_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 300,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series burst detection over a trailing RANGE window: for
    each event, the number of events in the half-open interval
    (t - W, t] of its own series; reported per series as the peak
    burst, the earliest timestamp achieving it, and the mean burst.

    The frame is a RANGE (not ROWS) window over integer microseconds —
    (W*1e6 - 1) PRECEDING .. CURRENT ROW — so simultaneous events are
    frame peers and the half-open boundary is exact integer
    arithmetic, identical in the SQL replay. One sort-shuffle per
    series; the per-series reduction shares the partitioning (no
    second Exchange). Peak ties break to the earliest timestamp.

    Returns (key, n, max_burst, t_peak, mean_burst)."""
    from ..kernel import ts_micros

    us = ts_micros(F.col(ts_col)) if dict(df.dtypes)[ts_col] not in (
        "double", "float", "bigint", "int"
    ) else (F.col(ts_col).cast("double") * F.lit(1e6)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-(window_seconds * 1_000_000 - 1), 0)
    )
    base = df.select(F.col(key_col), us.alias("_us")).withColumn(
        "_burst", F.count("*").over(w)
    )
    pick = F.struct((-F.col("_burst")).alias("_neg"), F.col("_us").alias("_us"))
    per = base.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.max("_burst").cast("long").alias("max_burst"),
        F.min(pick).alias("_best"),
        _r6(F.avg("_burst"), round_digits).alias("mean_burst"),
    )
    return per.select(
        key_col, "n", "max_burst",
        F.timestamp_micros(F.col("_best._us")).alias("t_peak"),
        "mean_burst",
    )


def coverage_report(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Data-completeness report: per (series, calendar day) the event
    count, the number of distinct active hours, and the hour-coverage
    fraction — the relation an ingestion monitor alerts on when a feed
    goes quiet. One partial-aggregable groupBy (count distinct is the
    only non-trivial agg and it is hour-of-day bounded at 24).

    Returns (key, day, n_events, hours_active, coverage)."""
    return (
        df.select(
            F.col(key_col),
            F.date_trunc("DAY", F.col(ts_col)).alias("day"),
            F.hour(ts_col).cast("int").alias("_h"),
        )
        .groupBy(key_col, "day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("_h").cast("long").alias("hours_active"),
            _r6(F.countDistinct("_h") / F.lit(24.0), round_digits).alias("coverage"),
        )
    )


def winsorize_series(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    lower: float = 0.01,
    upper: float = 0.99,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series winsorization: clip each value to its own series'
    [lower, upper] quantiles (Spark `percentile` == DuckDB
    quantile_cont — the parity the PSI monitor already pins). The
    per-series bound relation is series-sized and broadcast back onto
    the stream, so the corpus pass is map-only behind one small join;
    output is event-sized like the interpolation operators.

    Returns (key, tiebreak, value, value_w, clipped)."""
    x = F.col(value_col).cast("double")
    # bounds are ROUNDED before the clip: the two engines' quantile
    # interpolations can differ in ulps, and an unrounded bound would
    # make the clip/clipped-flag comparisons nondeterministic for
    # values sitting exactly on a quantile
    bounds = df.groupBy(key_col).agg(
        _r6(F.percentile(x, F.lit(float(lower))), round_digits).alias("_lo"),
        _r6(F.percentile(x, F.lit(float(upper))), round_digits).alias("_hi"),
    )
    joined = df.select(F.col(key_col), F.col(tiebreak_col), x.alias("_x")).join(
        F.broadcast(bounds), key_col
    )
    clipped = F.least(F.greatest(F.col("_x"), F.col("_lo")), F.col("_hi"))
    return joined.select(
        key_col,
        F.col(tiebreak_col),
        _r6(F.col("_x"), round_digits).alias("value"),
        _r6(clipped, round_digits).alias("value_w"),
        ((F.col("_x") < F.col("_lo")) | (F.col("_x") > F.col("_hi"))).alias("clipped"),
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    trend_halfwidth_hours: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition over the hourly grid:

      1. bucket to per-(series, hour) means (the 1h-tier relation);
      2. trend = centered moving average over a +/-H hour RANGE window
         on epoch seconds — a TIME-range frame, so missing buckets
         shrink the neighborhood instead of dragging in far-away rows
         (the classical MA assumes a regular grid; irregular event
         streams get the honest equivalent);
      3. seasonal index = mean detrended value per (series,
         hour-of-day), joined back (series-sized relation, broadcast);
      4. residual = value - trend - seasonal.

    Everything is groupBy/window/join arithmetic — one shuffle for the
    bucketing, one sort-shuffle for the trend window, one
    profile-sized aggregate + broadcast join — so the DuckDB oracle
    replays the exact CTE chain. Rounding happens only at the output
    surface; ties/frames are integer-second exact.

    Returns (key, hour_bucket, n, value, trend, seasonal, resid)."""
    x = F.col(value_col).cast("double")
    hb = F.date_trunc("HOUR", F.col(ts_col))
    bucketed = (
        df.select(F.col(key_col), hb.alias("hour_bucket"), x.alias("_x"))
        .groupBy(key_col, "hour_bucket")
        .agg(F.count("*").cast("long").alias("n"), F.avg("_x").alias("_y"))
    )
    sec = (F.unix_micros(F.col("hour_bucket").cast("timestamp"))
           / F.lit(1_000_000)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_sec")
        .rangeBetween(-trend_halfwidth_hours * 3600,
                      trend_halfwidth_hours * 3600)
    )
    trended = (
        bucketed.withColumn("_sec", sec)
        .withColumn("_trend", F.avg("_y").over(w))
        .withColumn("_detr", F.col("_y") - F.col("_trend"))
        .withColumn("_hod", F.hour("hour_bucket").cast("int"))
    )
    seas = trended.groupBy(key_col, "_hod").agg(
        F.avg("_detr").alias("_seas")
    )
    out = trended.join(F.broadcast(seas), [key_col, "_hod"])
    r = lambda c: _r6(c, round_digits)  # noqa: E731
    return out.select(
        F.col(key_col),
        F.col("hour_bucket"),
        F.col("n"),
        r(F.col("_y")).alias("value"),
        r(F.col("_trend")).alias("trend"),
        r(F.col("_seas")).alias("seasonal"),
        r(F.col("_y") - F.col("_trend") - F.col("_seas")).alias("resid"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    consecutive pair within a series (in (ts, tiebreak) order), count
    (from_type, to_type) and the row-conditional probability
    P(to | from). NULL types participate as real states (IS NOT
    DISTINCT FROM semantics live in the count keys themselves).

    One sort-shuffle for the per-series lag, then a partial-aggregable
    groupBy; the conditional probabilities run a window over the
    |types|^2-sized matrix relation, not the event stream.

    Returns (from_type, to_type, n, prob)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(key_col),
            F.col(type_col).alias("to_type"),
            F.lag(F.col(type_col)).over(w).alias("from_type"),
            F.row_number().over(w).alias("_pos"),
        )
        .filter(F.col("_pos") > 1)  # row 1 has no predecessor; a NULL
        # from_type beyond it is a real NULL state, not a boundary
    )
    mat = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = Window.partitionBy("from_type")
    return mat.select(
        "from_type", "to_type", "n",
        _r6(F.col("n") / F.sum("n").over(tot), round_digits).alias("prob"),
    )


def hourly_peaks(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Local maxima of each series' hourly activity: bucket to hourly
    sums, then a point is a peak when it exceeds BOTH the previous and
    next observed bucket (strictly — plateaus never peak; series
    endpoints never peak, having only one neighbor). Neighbors are the
    adjacent OBSERVED buckets in time order, so a quiet gap doesn't
    disqualify a genuine burst crest.

    All three comparisons run on the ROUNDED sums: two engines summing
    the same bucket in different orders can land 1 ulp apart, and an
    exact plateau must stay a plateau in both (comparing unrounded
    sums would let that ulp mint a phantom peak).

    Plan: one partial-aggregable bucketing groupBy + ONE Window (lag
    and lead share the frame) + a map-side filter; output peak-sized.

    Returns (key, hour_bucket, height, prominence) where prominence =
    height - max(neighbor heights)."""
    hb = F.date_trunc("HOUR", F.col(ts_col))
    hourly = (
        df.select(F.col(key_col), hb.alias("hour_bucket"),
                  F.col(value_col).cast("double").alias("_x"))
        .groupBy(key_col, "hour_bucket")
        .agg(_r6(F.sum("_x"), round_digits).alias("_s"))
    )
    w = Window.partitionBy(key_col).orderBy("hour_bucket")
    n = hourly.select(
        F.col(key_col), F.col("hour_bucket"), F.col("_s"),
        F.lag("_s").over(w).alias("_p"), F.lead("_s").over(w).alias("_n"),
    )
    return (
        n.where(
            F.col("_p").isNotNull() & F.col("_n").isNotNull()
            & (F.col("_s") > F.col("_p")) & (F.col("_s") > F.col("_n"))
        )
        .select(
            key_col, "hour_bucket",
            F.col("_s").alias("height"),
            _r6(F.col("_s") - F.greatest("_p", "_n"), round_digits)
            .alias("prominence"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 2.5,
    min_buckets: int = 24,
    round_digits: int = 6,
) -> DataFrame:
    """Seasonality-aware anomaly flags: run the classical decomposition
    (seasonal_decompose — trend + hour-of-day index removed), then flag
    hourly buckets whose RESIDUAL sits more than k sample-stds from
    the series' own residual distribution. A nightly-quiet series whose
    3am spike is modest in absolute terms still flags; a daily rush
    hour never does — the advantage over raw z-scores on the value.

    Composition discipline: the residuals entering the std are already
    rounded at the decomposition surface, so both engines aggregate
    identical inputs; series with fewer than `min_buckets` observed
    hours (std is noise) or near-zero residual spread never flag.

    Returns flagged buckets: (key, hour_bucket, value, resid, z)."""
    sd = seasonal_decompose(
        df, key_col=key_col, ts_col=ts_col, value_col=value_col,
        round_digits=round_digits,
    )
    stats = sd.groupBy(key_col).agg(
        F.count("*").cast("long").alias("_nb"),
        F.stddev_samp("resid").alias("_rs"),
    )
    out = sd.join(F.broadcast(stats), on=key_col)
    return (
        out.where(
            (F.col("_nb") >= min_buckets)
            & (F.col("_rs") > 1e-9)
            & (F.abs(F.col("resid")) > F.lit(k) * F.col("_rs"))
        )
        .select(
            key_col, "hour_bucket", "value", "resid",
            _r6(F.col("resid") / F.col("_rs"), round_digits).alias("z"),
        )
    )


def type_entropy(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Behavioral diversity per series: Shannon entropy of the
    event-type distribution, plus the ln(k)-normalized form in [0, 1]
    (NULL when only one type was ever observed — normalization is
    undefined, not 0). The probabilities are exact integer ratios, so
    the only float surface is ln itself (1-ulp class, absorbed by the
    output round).

    Plan: two partial-aggregable groupBys sharing the key partitioning
    ((key, type) counts, then the per-key reduce) — the entropy sum
    runs over the types-per-key relation, never the event stream.

    Returns (key, n, k_types, entropy, entropy_norm)."""
    per = df.groupBy(key_col, type_col).agg(
        F.count("*").cast("long").alias("_c")
    )
    # entropy from counts: H = ln(N) - sum(c*ln(c))/N  (exact-integer
    # inputs to every ln; avoids materializing p per row)
    agg = per.groupBy(key_col).agg(
        F.sum("_c").cast("long").alias("n"),
        F.count("*").cast("long").alias("k_types"),
        F.sum(F.col("_c") * F.log(F.col("_c").cast("double"))).alias("_clc"),
    )
    h = F.log(F.col("n").cast("double")) - F.col("_clc") / F.col("n")
    hn = F.when(
        F.col("k_types") > 1,
        F.round(h / F.log(F.col("k_types").cast("double")) + F.lit(1e-9),
                round_digits),
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        key_col, "n", "k_types",
        F.round(h + F.lit(1e-9), round_digits).alias("entropy"),
        hn.alias("entropy_norm"),
    )


def decorrelation_lag(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 0.5,
    max_lag: int = 5,
) -> DataFrame:
    """Memory horizon per series: the smallest lag whose sample ACF
    drops below `threshold` (NULL if none within max_lag — the series
    is still correlated at every probed lag, or too short/degenerate
    to measure). Composes acf_lags, so the comparison runs on the
    ROUNDED acf surface both engines share; the reduce is one more
    partial-aggregable groupBy on the (key, lag) relation.

    Returns (key, decorr_lag)."""
    a = acf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                 max_lag=max_lag)
    return a.groupBy(key_col).agg(
        F.min(F.when(F.col("acf") < threshold, F.col("lag")))
        .cast("int").alias("decorr_lag")
    )


# chi-square 95th percentiles for dof 1..12 (standard table values) —
# the Ljung-Box critical line for max_lag = dof; a constant lookup
# keeps the test SQL-replayable (no incomplete-gamma evaluation in
# either engine)
_CHI2_95 = {
    1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729, 5: 11.070498,
    6: 12.591587, 7: 14.06714, 8: 15.507313, 9: 16.918978, 10: 18.307038,
    11: 19.675138, 12: 21.02607,
}


def ljung_box(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test per series (Ljung & Box
    1978): Q = n(n+2) * sum_{k=1..K} r_k^2 / (n-k) against the
    chi-square(K) 5% critical value — the "is there ANY autocorrelation
    structure" readout that turns the acf_lags relation into a single
    decision per series.

    Composes acf_lags (one sort-shuffle + partial-aggregable groupBy),
    so the statistic is computed on the ROUNDED acf surface both
    engines share; n-k is exactly the per-lag pair count acf_lags
    already emits, and n recovers as n_pairs + lag. Q is NULL (test
    'insufficient') unless all K lags produced a defined acf (series
    longer than max_lag with positive variance).

    Returns (key, n, q_stat, dof, crit_5pct, reject_white_noise).
    """
    if max_lag not in _CHI2_95:
        raise ValueError(f"max_lag must be in {sorted(_CHI2_95)}")
    a = acf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                 tiebreak_col=tiebreak_col, max_lag=max_lag)
    per = a.groupBy(key_col).agg(
        F.max(F.when(F.col("n_pairs") > 0, F.col("n_pairs") + F.col("lag")))
        .cast("long").alias("n"),
        F.count("acf").alias("_k_ok"),
        F.sum(F.col("acf") * F.col("acf") / F.col("n_pairs")).alias("_ssum"),
    )
    q = F.when(
        F.col("_k_ok") == max_lag,
        _r6(F.col("n") * (F.col("n") + 2) * F.col("_ssum")),
    )
    crit = float(_CHI2_95[max_lag])
    return per.select(
        key_col, "n", q.alias("q_stat"),
        F.lit(int(max_lag)).cast("int").alias("dof"),
        F.lit(crit).alias("crit_5pct"),
        (q > crit).alias("reject_white_noise"),
    )


def event_trigrams(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    k: int = 25,
) -> DataFrame:
    """Top-k three-step action sequences across the corpus: consecutive
    (t1, t2, t3) type triples within each series in (ts, tiebreak)
    order, counted globally — the sequential-pattern readout that
    surfaces dominant tool chains in agent transcripts (a runaway
    retry loop shows up as an (x, x, x) triple near the top).

    Same physical shape as `event_transitions` one lag deeper: ONE
    sort-shuffle for the fused double-lag window, a partial-aggregable
    groupBy onto the <= |types|^3 triple relation, then
    orderBy().limit(k) (TakeOrderedAndProject — per-partition heaps,
    never a global sort). Returns (rank, t1, t2, t3, n), ties broken
    lexicographically."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    triples = (
        df.select(
            F.lag(F.col(type_col), 2).over(w).alias("t1"),
            F.lag(F.col(type_col), 1).over(w).alias("t2"),
            F.col(type_col).alias("t3"),
            F.row_number().over(w).alias("_pos"),
        )
        .filter(F.col("_pos") > 2)  # rows 1-2 have no full predecessor
        # chain; NULL types beyond them are real states, not boundaries
    )
    counts = triples.groupBy("t1", "t2", "t3").agg(
        F.count("*").cast("long").alias("n")
    )
    top = counts.orderBy(
        F.col("n").desc(), F.col("t1"), F.col("t2"), F.col("t3")
    ).limit(k)
    rank_w = Window.orderBy(
        F.col("n").desc(), F.col("t1"), F.col("t2"), F.col("t3")
    )
    return top.withColumn("rank", F.row_number().over(rank_w)).select(
        "rank", "t1", "t2", "t3", "n"
    )


def seasonal_naive_backtest(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str | None = None,
    season_hours: int = 24,
    round_digits: int = 6,
) -> DataFrame:
    """Backtest the two zero-parameter forecasters every monitoring
    stack starts from, per series, on the hourly rollup grid:

      - persistence (naive-1): yhat(t) = y(t - 1h)
      - seasonal naive:        yhat(t) = y(t - season_hours)

    ``value_col=None`` forecasts the hourly EVENT RATE (count per
    bucket) — the ops-traffic case; otherwise the hourly mean of the
    column. Evaluation is restricted to buckets where BOTH reference
    buckets exist, so the two forecasters are scored on the identical
    sample and the skill ratio is fair:

      skill = 1 - mae_seasonal / mae_naive   (NULL when mae_naive = 0)

    skill > 0 reads "the series has real daily seasonality — route it
    to the seasonal forecaster"; skill <= 0 reads "persistence wins".

    Scale shape: the raw stream collapses to the (key, hour) rollup
    relation in one shuffle; both forecasts are self-equi-joins of
    that rollup on (key, hour - Δ) — co-partitioned, rollup-sized, and
    cheap regardless of raw row count. Exact bucket arithmetic; floats
    surface only in the error means (rounded).

    Returns (key, n_eval, mae_naive, rmse_naive, mae_seasonal,
    rmse_seasonal, skill)."""
    val = (
        F.count("*").cast("double")
        if value_col is None
        else F.avg(F.col(value_col).cast("double"))
    )
    b = (
        df.select(F.col(key_col).alias("_k"),
                  F.date_trunc("HOUR", F.col(ts_col)).alias("_h"),
                  *([F.col(value_col)] if value_col else []))
        .groupBy("_k", "_h")
        .agg(val.alias("_y"))
    )
    base, per, sea = b.alias("base"), b.alias("per"), b.alias("sea")
    evaled = (
        base
        .join(per, (F.col("per._k") == F.col("base._k"))
              & (F.col("per._h") == F.col("base._h") - F.expr("INTERVAL 1 HOUR")))
        .join(sea, (F.col("sea._k") == F.col("base._k"))
              & (F.col("sea._h") == F.col("base._h")
                 - F.expr(f"INTERVAL {int(season_hours)} HOUR")))
        .select(
            F.col("base._k").alias("_k"),
            F.col("base._y").alias("_y"),
            F.col("per._y").alias("_p"),
            F.col("sea._y").alias("_s"),
        )
    )
    r = lambda c: _r6(c, round_digits)  # noqa: E731
    mae_n = F.avg(F.abs(F.col("_y") - F.col("_p")))
    mae_s = F.avg(F.abs(F.col("_y") - F.col("_s")))
    return (
        evaled.groupBy(F.col("_k").alias(key_col))
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            r(mae_n).alias("mae_naive"),
            r(F.sqrt(F.avg(F.pow(F.col("_y") - F.col("_p"), 2)))).alias("rmse_naive"),
            r(mae_s).alias("mae_seasonal"),
            r(F.sqrt(F.avg(F.pow(F.col("_y") - F.col("_s"), 2)))).alias("rmse_seasonal"),
            r(F.when(mae_n > 0, F.lit(1.0) - mae_s / mae_n)).alias("skill"),
        )
    )


def leadlag_xcorr(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Lead-lag cross-correlation between every pair of series: which
    series MOVES FIRST? For each ordered pair (a < b) compute the
    Pearson correlation of a's hourly rate against b's rate shifted by
    L hours for L in [-max_lag, +max_lag] and report the lag that
    maximizes it — positive best_lag reads "b leads a by L hours".
    The classic causality screen run before any pairwise model.

    Correlation is computed from raw sums (n, Σx, Σy, Σxx, Σyy, Σxy) —
    counts are exact in doubles, so both engines produce bit-identical
    sums and the rounded r replays exactly. Best lag breaks ties on
    rounded r desc, then |lag| asc, then lag asc. NULL r (zero
    variance in the overlap) never wins over a defined r.

    Scale shape: the raw stream collapses once to the zero-filled
    hourly grid; the ±max_lag shift enumeration is a broadcast
    crossJoin with a (2·max_lag+1)-row dimension; the pair join is a
    single equi-join on the HOUR (co-partitioned, grid-sized × lags);
    the per-(pair, lag) sums are partial-aggregable, leaving a
    pairs×lags relation that is key-cardinality², never data-sized.
    Returns (key_a, key_b, best_lag, r_best, n_best, r_zero).
    """
    from .symbolic import hourly_count_grid

    g = hourly_count_grid(df, key_col, ts_col)
    lags = g.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("_lag"))
    b_shift = g.select(
        F.col("_k").alias("_kb"), F.col("_h"), F.col("_y").alias("_yb")
    ).crossJoin(F.broadcast(lags)).select(
        "_kb", "_lag", "_yb",
        F.expr("_h + make_interval(0, 0, 0, 0, _lag, 0, 0)").alias("_h"),
    )
    joined = (
        g.select(F.col("_k").alias("_ka"), "_h", F.col("_y").alias("_ya"))
        .join(b_shift, "_h")
        .where(F.col("_ka") < F.col("_kb"))
    )
    cc = (
        joined.groupBy("_ka", "_kb", "_lag")
        .agg(
            F.count("*").cast("double").alias("_n"),
            F.sum("_ya").alias("_sx"),
            F.sum("_yb").alias("_sy"),
            F.sum(F.col("_ya") * F.col("_ya")).alias("_sxx"),
            F.sum(F.col("_yb") * F.col("_yb")).alias("_syy"),
            F.sum(F.col("_ya") * F.col("_yb")).alias("_sxy"),
        )
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(
        (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    cc = cc.select(
        "_ka", "_kb", "_lag",
        F.col("_n").cast("long").alias("_nn"),
        _r6(F.when(den > 0, num / den), round_digits).alias("_r"),
    )
    w = Window.partitionBy("_ka", "_kb").orderBy(
        F.col("_r").desc_nulls_last(), F.abs("_lag").asc(), F.col("_lag").asc())
    best = cc.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    zero = cc.where(F.col("_lag") == 0).select(
        "_ka", "_kb", F.col("_r").alias("r_zero"))
    return (
        best.join(zero, ["_ka", "_kb"])
        .select(
            F.col("_ka").alias("key_a"), F.col("_kb").alias("key_b"),
            F.col("_lag").alias("best_lag"), F.col("_r").alias("r_best"),
            F.col("_nn").alias("n_best"), "r_zero",
        )
    )


def holt_linear(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 24,
    round_digits: int = 6,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per series on the
    zero-filled hourly count grid — the first parametric forecaster
    after the `seasonal_naive_backtest` baselines: level l and trend b
    via

        l_t = α·y_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}

    initialized l₁=y₁, b₁=y₁-y₀ and iterated for t ≥ 2, with the
    one-step SSE accumulated against the pre-update forecast l+b
    (Hyndman & Athanasopoulos, FPP §8.2). l and b are rounded to
    `round_digits` EACH step (the kmeans oracle-replay discipline), so
    a DuckDB `list_reduce` fold replays the recursion hash-exactly.

    Scale shape: the recursion is inherently sequential per series, so
    it runs as a JVM `aggregate` fold over the per-key ordered array —
    the array is bounded by the series TIME SPAN (hours between first
    and last event), never by raw row count, and series are
    independent, so parallelism is across keys. No Python, no collect.
    Series with fewer than 3 grid hours emit nothing. Returns
    (key, n_hours, level, trend, forecast_h, rmse_1step).
    """
    from .symbolic import hourly_count_grid

    a1, a0 = float(alpha), float(1.0 - alpha)
    # pass 1-beta explicitly so both engines parse the SAME literal
    b1, b0 = float(beta), round(1.0 - beta, 12)
    g = hourly_count_grid(df, key_col, ts_col)
    ser = (
        g.groupBy(F.col("_k").alias(key_col))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_y"))),
            lambda s: s["_y"],
        ).alias("_ys"))
        .where(F.size("_ys") >= 3)
    )

    def step(acc, y):
        pred = acc["l"] + acc["b"]
        l2 = F.round(F.lit(a1) * y + F.lit(a0) * pred + F.lit(1e-9),
                     round_digits)
        bb = F.round(F.lit(b1) * (l2 - acc["l"]) + F.lit(b0) * acc["b"]
                     + F.lit(1e-9), round_digits)
        return F.struct(
            l2.alias("l"), bb.alias("b"),
            (acc["sse"] + (y - pred) * (y - pred)).alias("sse"),
        )

    init = F.struct(
        F.element_at("_ys", 2).alias("l"),
        (F.element_at("_ys", 2) - F.element_at("_ys", 1)).alias("b"),
        F.lit(0.0).alias("sse"),
    )
    st = F.aggregate(F.slice("_ys", 3, F.size("_ys") - 2), init, step)
    r = lambda c: _r6(c, round_digits)  # noqa: E731
    return ser.select(
        key_col,
        F.size("_ys").cast("long").alias("n_hours"),
        st["l"].alias("level"),
        st["b"].alias("trend"),
        r(st["l"] + F.lit(float(horizon)) * st["b"]).alias("forecast_h"),
        r(F.sqrt(st["sse"] / (F.size("_ys") - 2))).alias("rmse_1step"),
    )


def spearman_types(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Spearman rank correlation between every pair of per-key hourly
    count series, on their COMMON hours — the monotone-association
    companion to leadlag_xcorr's Pearson (rank correlation survives the
    heavy-tailed bursts that dominate a product-moment r on count
    data). Tie handling is the standard average-rank (fractional)
    assignment, computed on the joined common-hour relation so the
    ranks are a true permutation of 1..n per pair.

    Every rank is k + (t-1)/2 — an exact double — and the series are
    integer counts, so all six correlation sums are EXACT in both
    engines; the only rounding is the final rho/r at `round_digits`.

    Plan shape: one equi-join on the HOUR (grid-sized, co-partitioned),
    two rank windows over the pairs relation (types^2 x hours, bounded
    by key cardinality and time span, never event volume), one
    partial-aggregable groupBy. Returns
    (key_a, key_b, n_hours, rho_spearman, r_pearson).
    """
    from .symbolic import hourly_count_grid

    g = hourly_count_grid(df, key_col, ts_col)
    a = g.select(F.col("_k").alias("_ka"), "_h", F.col("_y").alias("_ya"))
    b = g.select(F.col("_k").alias("_kb"), "_h", F.col("_y").alias("_yb"))
    pairs = a.join(b, "_h").where(F.col("_ka") < F.col("_kb"))
    ra = (F.rank().over(Window.partitionBy("_ka", "_kb").orderBy("_ya"))
          + (F.count("*").over(Window.partitionBy("_ka", "_kb", "_ya")) - 1)
          / F.lit(2.0))
    rb = (F.rank().over(Window.partitionBy("_ka", "_kb").orderBy("_yb"))
          + (F.count("*").over(Window.partitionBy("_ka", "_kb", "_yb")) - 1)
          / F.lit(2.0))
    ranked = pairs.select(
        "_ka", "_kb", "_ya", "_yb", ra.alias("_ra"), rb.alias("_rb"))

    def _pearson(x, y):
        n = F.count("*").cast("double")
        num = n * F.sum(F.col(x) * F.col(y)) - F.sum(x) * F.sum(y)
        den = F.sqrt(
            (n * F.sum(F.col(x) * F.col(x)) - F.sum(x) * F.sum(x))
            * (n * F.sum(F.col(y) * F.col(y)) - F.sum(y) * F.sum(y)))
        return F.when(den > 0, _r6(num / den, round_digits))

    return (
        ranked.groupBy(F.col("_ka").alias("key_a"),
                       F.col("_kb").alias("key_b"))
        .agg(F.count("*").cast("long").alias("n_hours"),
             _pearson("_ra", "_rb").alias("rho_spearman"),
             _pearson("_ya", "_yb").alias("r_pearson"))
    )


def holt_winters(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    period: int = 24,
    round_digits: int = 6,
) -> DataFrame:
    """Holt-Winters additive seasonal (triple exponential) smoothing
    per series on the zero-filled hourly count grid — the seasonal
    completion of the exponential family (ewma_level -> holt_linear ->
    here), for the diurnal-cycle series this events table actually is:

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(y_t − l_{t−1} − b_{t−1}) + (1−γ)s_{t−m}

    (Hyndman & Athanasopoulos, FPP §8.3), initialized from the first
    two full seasons — l = mean(season 1), b = (mean(season 2) −
    mean(season 1))/m, s_i = y_i − l — and iterated from t = m+1 with
    the one-step SSE accumulated against the pre-update forecast
    l + b + s_{t−m}. Like holt_linear, (l, b, s_j) are rounded to
    `round_digits` EACH step, making the whole state a 6-decimal fixed
    point a DuckDB recursive CTE replays hash-exactly — including the
    24-slot seasonal vector, which rides the fold as an array updated
    one slot per step.

    Scale shape: inherently sequential per series, so it runs as one
    JVM `aggregate` fold over the per-key ordered array (bounded by
    the series TIME SPAN in hours, never raw row count); parallelism
    is across keys; the seasonal array update is a JVM `transform`
    inside the fold (nested HOF, no Python). Series with fewer than
    2·period grid hours emit nothing. Returns (key, n_hours, level,
    trend, seasonal_amplitude, forecast_24h, rmse_1step).
    """
    from .symbolic import hourly_count_grid

    m = int(period)
    a1, a0 = float(alpha), round(1.0 - alpha, 12)
    b1, b0 = float(beta), round(1.0 - beta, 12)
    g1, g0 = float(gamma), round(1.0 - gamma, 12)
    g = hourly_count_grid(df, key_col, ts_col)
    ser = (
        g.groupBy(F.col("_k").alias(key_col))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_y"))),
            lambda s: s["_y"],
        ).alias("_ys"))
        .where(F.size("_ys") >= 2 * m)
    )

    def _mean(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, y: a + y) / F.lit(
            float(m))

    rd = round_digits
    l0 = F.round(_mean(F.slice("_ys", 1, m)) + F.lit(1e-9), rd)
    b_init = F.round(
        (_mean(F.slice("_ys", m + 1, m)) - _mean(F.slice("_ys", 1, m)))
        / F.lit(float(m)) + F.lit(1e-9), rd)
    ser = ser.select(key_col, "_ys", l0.alias("_l0"), b_init.alias("_b0"))
    s0 = F.transform(
        F.slice("_ys", 1, m),
        lambda v: F.round(v - F.col("_l0") + F.lit(1e-9), rd))

    def step(acc, y):
        j0 = (acc["t"] % m).cast("int")           # 0-based seasonal slot
        sold = F.element_at(acc["s"], j0 + 1)
        pred = acc["l"] + acc["b"] + sold
        l2 = F.round(F.lit(a1) * (y - sold) + F.lit(a0)
                     * (acc["l"] + acc["b"]) + F.lit(1e-9), rd)
        b2 = F.round(F.lit(b1) * (l2 - acc["l"]) + F.lit(b0) * acc["b"]
                     + F.lit(1e-9), rd)
        snew = F.round(F.lit(g1) * (y - acc["l"] - acc["b"])
                       + F.lit(g0) * sold + F.lit(1e-9), rd)
        return F.struct(
            l2.alias("l"), b2.alias("b"),
            F.transform(
                acc["s"],
                lambda v, i: F.when(i == j0, snew).otherwise(v),
            ).alias("s"),
            (acc["sse"] + (y - pred) * (y - pred)).alias("sse"),
            (acc["t"] + 1).alias("t"),
        )

    init = F.struct(
        F.col("_l0").alias("l"), F.col("_b0").alias("b"), s0.alias("s"),
        F.lit(0.0).alias("sse"), F.lit(m).cast("long").alias("t"),
    )
    st = F.aggregate(F.slice("_ys", m + 1, F.size("_ys") - m), init, step)
    n = F.size("_ys")
    r = lambda c: _r6(c, rd)  # noqa: E731
    return ser.select(
        key_col,
        n.cast("long").alias("n_hours"),
        st["l"].alias("level"),
        st["b"].alias("trend"),
        r(F.array_max(st["s"]) - F.array_min(st["s"]))
        .alias("seasonal_amplitude"),
        r(st["l"] + F.lit(float(m)) * st["b"]
          + F.element_at(st["s"], ((n - 1) % m + 1).cast("int")))
        .alias("forecast_24h"),
        r(F.sqrt(st["sse"] / (n - m))).alias("rmse_1step"),
    )


def pacf_lags(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Partial autocorrelation function per series at lags 1..max_lag
    via the Durbin-Levinson recursion over the sample ACF — the other
    half of the Box-Jenkins identification pair (ACF tails off / PACF
    cuts off at p for an AR(p) process).

    The recursion runs over LAGS, not time, so for a fixed max_lag it
    unrolls into closed-form column expressions — no fold, no window
    beyond what acf_lags already does, and the unrolled expressions
    are generated by ONE Python loop for both engines (the oracle
    interpolates the same strings), so the float structure is
    identical by construction. Every phi at every level is rounded at
    6 (the fixed-point discipline), making each level's inputs
    bit-identical across engines. A level with a NULL acf or a zero
    denominator yields NULL from that lag on.

    Returns (key, lag, pacf).
    """
    a = acf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                 tiebreak_col=tiebreak_col, max_lag=max_lag)
    wide = a.groupBy(key_col).pivot("lag", list(range(1, max_lag + 1))).agg(
        F.first("acf"))
    wide = wide.select(
        key_col, *[F.col(str(L)).alias(f"_r{L}") for L in range(1, max_lag + 1)])

    # Durbin-Levinson, unrolled: phi[k][j] columns, each rounded at 6
    r = {L: F.col(f"_r{L}") for L in range(1, max_lag + 1)}
    phi_prev: dict[int, object] = {}
    for k in range(1, max_lag + 1):
        if k == 1:
            phi_kk = _r6(r[1])
        else:
            num = r[k]
            den = F.lit(1.0)
            for j in range(1, k):
                num = num - phi_prev[j] * r[k - j]
                den = den - phi_prev[j] * r[j]
            phi_kk = F.when(F.abs(den) > 0, _r6(num / den))
        wide = wide.withColumn(f"_p{k}{k}", phi_kk)
        new_phi = {k: F.col(f"_p{k}{k}")}
        for j in range(1, k):
            wide = wide.withColumn(
                f"_p{k}{j}",
                _r6(phi_prev[j] - F.col(f"_p{k}{k}") * phi_prev[k - j]))
            new_phi[j] = F.col(f"_p{k}{j}")
        phi_prev = new_phi
    rows = F.array(*[
        F.struct(F.lit(k).cast("int").alias("lag"),
                 F.col(f"_p{k}{k}").alias("pacf"))
        for k in range(1, max_lag + 1)
    ])
    return (
        wide.select(key_col, F.explode(rows).alias("_x"))
        .select(key_col, "_x.lag", "_x.pacf")
    )


def effective_sample_size(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Autocorrelation-adjusted effective sample size per series:
    ESS = n / tau with tau = 1 + 2 sum rho_k over the INITIAL POSITIVE
    sequence (Geyer's truncation, simplified to the first non-positive
    or undefined acf within max_lag) — the "how many independent
    observations is this series really worth" readout that turns every
    downstream standard error honest. A white series gets tau ~ 1
    (ESS ~ n); a slow-moving one gets tau >> 1.

    Composes acf_lags on its ROUNDED surface; the truncation lag and
    the <= 5-term sum are identical in both engines. Returns
    (key, n, tau, ess); a constant series (acf undefined everywhere)
    truncates immediately -> tau = 1, ess = n, by convention.
    """
    a = acf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                 tiebreak_col=tiebreak_col, max_lag=max_lag)
    per = a.groupBy(key_col).agg(
        F.max(F.when(F.col("n_pairs") > 0, F.col("n_pairs") + F.col("lag")))
        .cast("long").alias("n"),
        F.min(F.when(F.col("acf").isNull() | (F.col("acf") <= 0),
                     F.col("lag"))).alias("_stop"),
        *[F.sum(F.when(F.col("lag") == L, F.col("acf"))).alias(f"_a{L}")
          for L in range(1, max_lag + 1)],
    )
    stop = F.coalesce(F.col("_stop"), F.lit(max_lag + 1))
    srho = None
    for L in range(1, max_lag + 1):
        term = F.when(F.lit(L) < stop, F.coalesce(F.col(f"_a{L}"),
                                                  F.lit(0.0))) \
            .otherwise(F.lit(0.0))
        srho = term if srho is None else srho + term
    tau = F.lit(1.0) + F.lit(2.0) * srho
    return per.select(
        key_col, "n",
        _r6(tau).alias("tau"),
        F.when(F.col("n").isNotNull(), _r6(F.col("n") / tau)).alias("ess"),
    )


def model_id(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 5,
) -> DataFrame:
    """Box-Jenkins model-identification readout per series: the
    largest lag with a significant PACF suggests the AR order (PACF
    cuts off at p), the largest with a significant ACF suggests the MA
    order (ACF cuts off at q); significance at the standard
    +/- 1.96/sqrt(n) band. Composes the rounded acf/pacf surfaces;
    the band is a pure function of integer n, so both engines compare
    identical doubles. Returns (key, n, ar_order, ma_order) with 0
    meaning "no significant structure within max_lag".
    """
    a = acf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                 tiebreak_col=tiebreak_col, max_lag=max_lag)
    p = pacf_lags(df, key_col=key_col, ts_col=ts_col, value_col=value_col,
                  tiebreak_col=tiebreak_col, max_lag=max_lag)
    n_rel = a.groupBy(key_col).agg(
        F.max(F.when(F.col("n_pairs") > 0, F.col("n_pairs") + F.col("lag")))
        .cast("long").alias("n"))
    thr = F.lit(1.96) / F.sqrt(F.col("n"))
    ar = (
        p.join(n_rel, key_col)
        .groupBy(key_col)
        .agg(F.max(F.when(F.abs(F.col("pacf")) > thr, F.col("lag")))
             .alias("_ar"))
    )
    ma = (
        a.join(n_rel, key_col)
        .groupBy(key_col)
        .agg(F.max(F.when(F.abs(F.col("acf")) > thr, F.col("lag")))
             .alias("_ma"))
    )
    return (
        n_rel.join(ar, key_col, "left").join(ma, key_col, "left")
        .select(key_col, "n",
                F.coalesce(F.col("_ar"), F.lit(0)).cast("int")
                .alias("ar_order"),
                F.coalesce(F.col("_ma"), F.lit(0)).cast("int")
                .alias("ma_order"))
    )


def seasonal_naive_interval(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    season_hours: int = 24,
    alpha: float = 0.9,
    round_digits: int = 6,
) -> DataFrame:
    """Split-conformal-style prediction interval for the seasonal-naive
    forecaster, per series on the zero-filled hourly count grid: the
    next-hour point forecast is y(T+1 - season), and the interval is
    +/- the empirical `alpha`-quantile of the in-sample absolute
    seasonal-naive residuals |y_t - y_{t-season}| — the
    distribution-free calibration step (Vovk; the "conformal" recipe)
    that turns seasonal_naive_backtest's point scores into an interval
    with measured coverage.

    Exact interpolated quantile over integer-valued residuals (Spark
    `percentile` == DuckDB `quantile_cont`); coverage is the in-sample
    fraction |r| <= q, compared on the ROUNDED q so both engines
    include identical residuals. One sort-window for the seasonal lag,
    grid-sized aggregates, one grid-sized join for the forecast source
    row. Returns (key, n_hours, n_resid, forecast_next, pi_lo, pi_hi,
    q_abs_err, coverage); NULL interval when no residuals exist.
    """
    from .symbolic import hourly_count_grid

    m = int(season_hours)
    g = hourly_count_grid(df, key_col, ts_col)
    w = Window.partitionBy("_k").orderBy("_i")
    lagged = g.select(
        "_k", "_i", "_y",
        (F.col("_y") - F.lag("_y", m).over(w)).alias("_r"),
    )
    q = F.expr(f"percentile(abs(_r), {float(alpha)!r})")
    per = lagged.groupBy(F.col("_k").alias(key_col)).agg(
        F.count("*").cast("long").alias("n_hours"),
        F.count("_r").cast("long").alias("n_resid"),
        _r6(q, round_digits).alias("q_abs_err"),
    )
    src = lagged.select(F.col("_k").alias("_sk"), F.col("_i").alias("_si"),
                        F.col("_y").alias("_fc"))
    joined = per.join(
        src,
        (F.col(key_col) == F.col("_sk"))
        & (F.col("_si") == F.col("n_hours") - m),
        "left",
    ).select(key_col, "n_hours", "n_resid", "q_abs_err", "_fc")
    # coverage on the rounded q: recompute against lagged in one more
    # grid-sized aggregate
    per_q = per.select(F.col(key_col).alias("_pk"),
                       F.col("q_abs_err").alias("_q"))
    cov = (
        lagged.join(per_q, F.col("_k") == F.col("_pk"))
        .groupBy(F.col("_k").alias("_ck"))
        .agg(F.count(F.when(F.abs("_r") <= F.col("_q"), 1)).alias("_in"),
             F.count("_r").alias("_nr"))
        .select("_ck", F.when(F.col("_nr") > 0,
                              F.col("_in") / F.col("_nr")).alias("_cov"))
    )
    out = joined.join(cov, F.col(key_col) == F.col("_ck"), "left")
    ok = F.col("n_resid") > 0
    return out.select(
        key_col, "n_hours", "n_resid",
        F.when(ok, F.col("_fc")).alias("forecast_next"),
        F.when(ok, _r6(F.col("_fc") - F.col("q_abs_err"), round_digits))
        .alias("pi_lo"),
        F.when(ok, _r6(F.col("_fc") + F.col("q_abs_err"), round_digits))
        .alias("pi_hi"),
        F.when(ok, F.col("q_abs_err")).alias("q_abs_err"),
        F.when(ok, _r6(F.col("_cov"), round_digits)).alias("coverage"),
    )


def kalman_level(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    q_var: float = 1.0,
    r_var: float = 4.0,
    round_digits: int = 6,
) -> DataFrame:
    """Kalman filter for the local-level model per series on the
    zero-filled hourly count grid — the ADAPTIVE-gain member of the
    smoothing family (ewma_level and holt_linear use fixed gains; the
    Kalman gain k_t = (p+q)/(p+q+r) starts high while the level is
    uncertain and settles to the steady state, so level estimates
    recover faster after gaps and shifts):

        predict: p_t|t-1 = p_{t-1} + q
        gain:    k_t = p_t|t-1 / (p_t|t-1 + r)
        update:  l_t = l_{t-1} + k_t (y_t - l_{t-1})
                 p_t = (1 - k_t) p_t|t-1

    initialized l_1 = y_1, p_1 = r (one observation's worth of
    uncertainty) and iterated from t = 2, with the innovation SSE
    accumulated against the pre-update level. (l, p) are rounded each
    step (the holt fixed-point discipline) so a DuckDB recursive CTE
    replays the filter hash-exactly.

    Same scale shape as holt_linear: a JVM `aggregate` fold over the
    per-key ordered array, bounded by the series time span; no Python.
    Series with fewer than 2 grid hours emit nothing. Returns
    (key, n_hours, level, p_var, gain, rmse_innov).
    """
    from .symbolic import hourly_count_grid

    qv, rv = float(q_var), float(r_var)
    rd = round_digits
    g = hourly_count_grid(df, key_col, ts_col)
    ser = (
        g.groupBy(F.col("_k").alias(key_col))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_y"))),
            lambda s: s["_y"],
        ).alias("_ys"))
        .where(F.size("_ys") >= 2)
    )

    def step(acc, y):
        pp = acc["p"] + F.lit(qv)
        k = pp / (pp + F.lit(rv))
        l2 = F.round(acc["l"] + k * (y - acc["l"]) + F.lit(1e-9), rd)
        p2 = F.round((F.lit(1.0) - k) * pp + F.lit(1e-9), rd)
        return F.struct(
            l2.alias("l"), p2.alias("p"),
            (acc["sse"] + (y - acc["l"]) * (y - acc["l"])).alias("sse"),
        )

    init = F.struct(
        F.element_at("_ys", 1).alias("l"),
        F.lit(rv).alias("p"),
        F.lit(0.0).alias("sse"),
    )
    st = F.aggregate(F.slice("_ys", 2, F.size("_ys") - 1), init, step)
    n = F.size("_ys")
    r = lambda c: _r6(c, rd)  # noqa: E731
    pp_fin = st["p"] + F.lit(qv)
    return ser.select(
        key_col,
        n.cast("long").alias("n_hours"),
        st["l"].alias("level"),
        st["p"].alias("p_var"),
        r(pp_fin / (pp_fin + F.lit(rv))).alias("gain"),
        r(F.sqrt(st["sse"] / (n - 1))).alias("rmse_innov"),
    )


def ar1_fit(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """AR(1) fit per series on the zero-filled hourly count grid via
    OLS of x_t on x_{t-1}: x_t = c + φ·x_{t-1} + ε. Emits the mean-
    reversion diagnostics every monitoring stack wants — φ (persistence),
    the intercept, the innovation variance, and the half-life of a
    shock ln(2)/(-ln φ) (NULL unless 0 < φ < 1; also NULL when fewer
    than 3 pairs leave the residual variance undefined).

    Everything comes from raw pair sums (n, Σx, Σy, Σxx, Σyy, Σxy) —
    exact integer arithmetic in doubles, so both engines round the
    identical statistics. One sort window per key builds the lag pairs;
    one partial-aggregable groupBy finishes. Returns
    (key, n_pairs, phi, intercept, resid_var, half_life).
    """
    from .symbolic import hourly_count_grid

    g = hourly_count_grid(df, key_col, ts_col)
    w = Window.partitionBy("_k").orderBy("_i")
    pairs = (
        g.select("_k", F.col("_y").alias("_yt"),
                 F.lag("_y", 1).over(w).alias("_xp"))
        .where(F.col("_xp").isNotNull())
    )
    per = pairs.groupBy(F.col("_k").alias(key_col)).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_xp").alias("_sx"),
        F.sum("_yt").alias("_sy"),
        F.sum(F.col("_xp") * F.col("_xp")).alias("_sxx"),
        F.sum(F.col("_yt") * F.col("_yt")).alias("_syy"),
        F.sum(F.col("_xp") * F.col("_yt")).alias("_sxy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx, syy, sxy = F.col("_sxx"), F.col("_syy"), F.col("_sxy")
    den = n * sxx - sx * sx
    phi = F.when(den > 0, (n * sxy - sx * sy) / den)
    c = (sy - phi * sx) / n
    # Σ(y - c - φx)² expanded to the already-computed sums
    sse = (syy + n * c * c + phi * phi * sxx
           - 2 * c * sy - 2 * phi * sxy + 2 * c * phi * sx)
    r = lambda col: _r6(col, round_digits)  # noqa: E731
    phi_r = r(phi)
    return per.select(
        key_col,
        n.cast("long").alias("n_pairs"),
        phi_r.alias("phi"),
        r(c).alias("intercept"),
        F.when(n > 2, r(sse / (n - 2))).alias("resid_var"),
        F.when((phi_r > 0) & (phi_r < 1),
               r(F.log(F.lit(2.0)) / -F.log(phi_r))).alias("half_life"),
    )


def seasonal_strength(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    trend_halfwidth_hours: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Strength-of-trend and strength-of-seasonality per series (Wang,
    Hyndman & Smith 2006; the tsfeatures definitions):

        F_trend = max(0, 1 - Var(resid) / Var(trend + resid))
        F_seas  = max(0, 1 - Var(resid) / Var(seasonal + resid))

    computed on the components of `seasonal_decompose` (trend + resid
    = value - seasonal, the deseasonalized series; seasonal + resid =
    value - trend, the detrended series). Both land in [0, 1]: ~0
    reads "no structure", ~1 reads "the component explains the
    series". The one-number routing summary for the backtest/Holt
    forecaster choice.

    Variances come from raw sums of the ROUNDED decompose columns
    (shared with the oracle), so both engines divide the identical
    quantities. Series with zero variance in a denominator emit NULL
    for that strength. One extra partial-aggregable groupBy on the
    bucket relation — nothing data-sized moves.

    Returns (key, n_buckets, trend_strength, seasonal_strength)."""
    sd = seasonal_decompose(df, key_col, ts_col, value_col,
                            trend_halfwidth_hours, round_digits)
    rr = F.col("resid")
    ds = F.col("value") - F.col("seasonal")   # trend + resid
    dt = F.col("value") - F.col("trend")      # seasonal + resid
    per = sd.groupBy(key_col).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(rr).alias("_sr"), F.sum(rr * rr).alias("_srr"),
        F.sum(ds).alias("_sd"), F.sum(ds * ds).alias("_sdd"),
        F.sum(dt).alias("_st"), F.sum(dt * dt).alias("_stt"),
    )
    n = F.col("_n")
    var = lambda s, ss: (F.col(ss) - F.col(s) * F.col(s) / n) / (n - 1)  # noqa: E731
    vr, vds, vdt = var("_sr", "_srr"), var("_sd", "_sdd"), var("_st", "_stt")
    r = lambda c: _r6(c, round_digits)  # noqa: E731
    return per.where(n >= 3).select(
        key_col,
        n.cast("long").alias("n_buckets"),
        F.when(vds > 0, r(F.greatest(F.lit(0.0), 1 - vr / vds))
               ).alias("trend_strength"),
        F.when(vdt > 0, r(F.greatest(F.lit(0.0), 1 - vr / vdt))
               ).alias("seasonal_strength"),
    )


def peak_rate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 60,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series peak sliding-window event rate: the maximum number of
    events inside ANY window of `window_seconds` ending at an event
    (inclusive on both bounds — the rate-limiter / burst-SLA question
    "did this actor ever exceed N events per minute?").

    Physical shape: ONE range-frame window per series key (a single
    sort-shuffle; the RANGE frame is tiebreak-free because ties are all
    included), then a series-sized max aggregate with the earliest
    achieving timestamp as the deterministic witness. No self-join, no
    event-time expansion — this is the shape that survives hot keys,
    because the range frame streams within the sorted partition.

    Returns (key, n_events, peak_rate, t_peak) where t_peak is the
    MIN event-ts at which the peak window ends.
    """
    from pyspark.sql import Window as W

    from ..kernel import ts_micros

    us = ts_micros(F.col(ts_col))
    w = (
        W.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    rated = (
        df.select(F.col(key_col), F.col(ts_col).alias("_ts"), us.alias("_us"))
        .withColumn("_rate", F.count("*").over(w))
        # same partition spec -> Catalyst reuses the one exchange
        .withColumn("_mx", F.max("_rate").over(W.partitionBy(key_col)))
    )
    return (
        rated.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("_rate").cast("long").alias("peak_rate"),
            F.min(F.when(F.col("_rate") == F.col("_mx"), F.col("_ts")))
             .alias("t_peak"),
        )
    )


def binseg_changepoints(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    min_size: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Multiple changepoints per series via depth-2 binary segmentation
    (Scott & Knott 1974; the binseg baseline of the `ruptures` /
    `changepoint` packages): find the split that most reduces total
    squared error, then the best split inside each resulting half.

    Everything derives from per-series prefix sums, so the whole search
    is closed-form JVM math — NO per-candidate rescan: with S1/S2 the
    running sum and sum of squares, SSE(a..b) = (S2_b - S2_{a-1}) -
    (S1_b - S1_{a-1})² / (b - a + 1), and the gain of splitting segment
    (a..b) at t is SSE(a..b) - SSE(a..t) - SSE(t+1..b). Candidates
    respect `min_size` on both sides. Gains are ROUNDED before the
    argmax and ties break to the earliest position (cross-engine
    determinism — the cusum/kmeans discipline).

    Physical shape: ONE sort-shuffle per series key builds positions +
    prefix sums; the root argmax is a struct-min aggregate; the child
    searches reuse the same prefix-sum relation joined back to the
    series-sized root result (co-partitioned equi-join on the key — a
    second pass over rows, not a second sort). Returns up to 3 rows per
    series: (key, level, pos, t_cp, gain) with level in
    ('root','left','right'), pos the 1-based last index of the left
    side, and only positive-gain splits emitted.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col(value_col).cast("double")
    base = df.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        x.alias("_x"),
        F.row_number().over(w).alias("_pos"),
        F.sum(x).over(cum).alias("_s1"),
        F.sum(x * x).over(cum).alias("_s2"),
        F.count("*").over(Window.partitionBy(key_col)).alias("_n"),
        F.sum(x).over(Window.partitionBy(key_col)).alias("_t1"),
        F.sum(x * x).over(Window.partitionBy(key_col)).alias("_t2"),
    )

    def sse(s2_hi, s2_lo, s1_hi, s1_lo, cnt):
        d1 = s1_hi - s1_lo
        return (s2_hi - s2_lo) - d1 * d1 / cnt

    rd = lambda c: F.round(c + F.lit(1e-9), round_digits)  # noqa: E731

    # ---- root: split the whole series (candidates [ms, n-ms]) ----
    pos, n = F.col("_pos"), F.col("_n")
    sse_tot = sse(F.col("_t2"), F.lit(0.0), F.col("_t1"), F.lit(0.0), n)
    sse_l = sse(F.col("_s2"), F.lit(0.0), F.col("_s1"), F.lit(0.0), pos)
    sse_r = sse(F.col("_t2"), F.col("_s2"), F.col("_t1"), F.col("_s1"),
                n - pos)
    root_gain = rd(sse_tot - sse_l - sse_r)
    cand = base.where((pos >= min_size) & (pos <= n - min_size))
    pick = F.struct((-root_gain).alias("_ng"), pos.alias("_pos"),
                    F.col("_ts").alias("_ts"), root_gain.alias("_g"))
    root = (
        cand.groupBy(key_col).agg(F.min(pick).alias("_b"))
        .select(F.col(key_col), F.col("_b._pos").alias("_rpos"),
                F.col("_b._ts").alias("_rts"), F.col("_b._g").alias("_rg"))
        .where(F.col("_rg") > 0)
    )

    # prefix sums AT the root split, for the child segment SSEs
    at_root = (
        base.join(root, key_col)
        .where(F.col("_pos") == F.col("_rpos"))
        .select(F.col(key_col), F.col("_rpos"), F.col("_rts"),
                F.col("_rg"), F.col("_s1").alias("_rs1"),
                F.col("_s2").alias("_rs2"))
    )

    # ---- children: best split of (1..T) and (T+1..n) ----
    kids = base.join(at_root, key_col)
    T = F.col("_rpos")
    # left segment (1..T): split at t in [ms, T-ms]
    l_tot = sse(F.col("_rs2"), F.lit(0.0), F.col("_rs1"), F.lit(0.0), T)
    l_gain = rd(l_tot - sse_l
                - sse(F.col("_rs2"), F.col("_s2"), F.col("_rs1"),
                      F.col("_s1"), T - pos))
    # right segment (T+1..n): split at t in [T+ms, n-ms]
    r_tot = sse(F.col("_t2"), F.col("_rs2"), F.col("_t1"), F.col("_rs1"),
                n - T)
    r_gain = rd(r_tot
                - sse(F.col("_s2"), F.col("_rs2"), F.col("_s1"),
                      F.col("_rs1"), pos - T)
                - sse_r)
    side = F.when((pos >= min_size) & (pos <= T - min_size), F.lit("left")) \
        .when((pos >= T + min_size) & (pos <= n - min_size), F.lit("right"))
    gain = F.when(side == "left", l_gain).otherwise(r_gain)
    kid_pick = F.struct((-gain).alias("_ng"), pos.alias("_pos"),
                        F.col("_ts").alias("_ts"), gain.alias("_g"))
    children = (
        kids.where(side.isNotNull())
        .groupBy(key_col, side.alias("level"))
        .agg(F.min(kid_pick).alias("_b"))
        .select(F.col(key_col), "level",
                F.col("_b._pos").cast("long").alias("pos"),
                F.col("_b._ts").alias("t_cp"), F.col("_b._g").alias("gain"))
        .where(F.col("gain") > 0)
    )
    root_rows = root.select(
        F.col(key_col), F.lit("root").alias("level"),
        F.col("_rpos").cast("long").alias("pos"),
        F.col("_rts").alias("t_cp"), F.col("_rg").alias("gain"),
    )
    return root_rows.unionByName(children)
