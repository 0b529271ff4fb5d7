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

__all__ = ["cohort_retention", "hampel_outliers", "skew_report",
           "json_field_stats", "value_histogram",
           "rollup_summary", "pivot_counts", "histogram_quantiles",
           "benford_screen", "activity_tail_index", "series_health", "calendar_uniformity", "weekend_lift"]


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


def json_field_stats(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Semi-structured payload profiling: extract one numeric field
    from a JSON column (get_json_object — JVM path-expression
    evaluation inlined into the scan, no UDF, no schema inference
    pass) and aggregate per group: presence rate, mean/std, exact
    p50/p95, min/max. The everyday "what's inside props" relation; a
    malformed or missing field extracts NULL and counts against
    presence, never poisons an aggregate.

    Plan: map-only extraction + ONE partial-aggregable groupBy (the
    exact percentiles sort within groups — dashboard-tier group
    cardinality assumed, same trade as value_percentiles).

    Returns (group, n, n_present, present_rate, mean, std, p50, p95,
    min, max)."""
    # try_cast, not cast: ANSI mode is on engine-wide, and a
    # string-valued field must degrade to NULL (absent), not abort the
    # job — the oracle mirrors with json_valid + TRY_CAST
    v = F.get_json_object(F.col(json_col), f"$.{field}").try_cast("double")
    g = df.select(F.col(group_col), v.alias("_v"))
    n = F.count("*").cast("long")
    npres = F.count("_v").cast("long")
    return g.groupBy(group_col).agg(
        n.alias("n"),
        npres.alias("n_present"),
        _r(npres / n, round_digits).alias("present_rate"),
        _r(F.avg("_v"), round_digits).alias("mean"),
        _r(F.stddev_samp("_v"), round_digits).alias("std"),
        _r(F.percentile(F.col("_v"), F.lit(0.5)), round_digits).alias("p50"),
        _r(F.percentile(F.col("_v"), F.lit(0.95)), round_digits).alias("p95"),
        _r(F.min("_v"), round_digits).alias("min"),
        _r(F.max("_v"), round_digits).alias("max"),
    )


def value_histogram(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Equi-width histogram per group over a FIXED [lo, hi) range:
    bin = floor((x - lo) / width) clamped into [0, n_bins-1] (the last
    bin absorbs x == hi; out-of-range rows land in the edge bins, so
    every row is counted and the per-group bin sums reconcile with the
    group totals). Fixed bounds — not per-group min/max — keep bins
    comparable across groups and rounds, and make the operator a pure
    map + partial-aggregable groupBy with groups*n_bins output rows.

    Returns (group, bin, bin_lo, bin_hi, n, frac)."""
    width = (hi - lo) / n_bins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    per = (
        df.select(F.col(group_col), b.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = Window.partitionBy(group_col)
    return per.select(
        group_col,
        "bin",
        _r(F.lit(lo) + F.col("bin") * F.lit(width), round_digits)
        .alias("bin_lo"),
        _r(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), round_digits)
        .alias("bin_hi"),
        "n",
        _r(F.col("n") / F.sum("n").over(wt), round_digits).alias("frac"),
    )


def rollup_summary(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Hierarchical subtotals via Catalyst's native ROLLUP: per
    (event_type, day-of-week) cells PLUS per-type subtotals PLUS the
    grand total in ONE pass — the OLAP report shape SQL engines share
    (GROUP BY ROLLUP), with NULL as the subtotal marker at each level.
    Spark expands the grouping sets inside a single partial-aggregable
    aggregate: no union of three scans, no three shuffles.

    Returns (event_type, dow, n, sum_value, mean_value) where NULL
    event_type/dow rows are the subtotal levels."""
    x = F.col(value_col).cast("double")
    return (
        df.select(
            F.col(type_col),
            (F.dayofweek(ts_col) - 1).cast("int").alias("dow"),
            x.alias("_x"),
        )
        .rollup(type_col, "dow")
        .agg(
            F.count("*").cast("long").alias("n"),
            _r(F.sum("_x"), round_digits).alias("sum_value"),
            _r(F.avg("_x"), round_digits).alias("mean_value"),
        )
    )


def pivot_counts(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    types: tuple[str, ...] = ("view", "click", "signup", "purchase", "error"),
    round_digits: int = 6,
) -> DataFrame:
    """Long-to-wide pivot: one row per key with a count column per
    event type plus the total and the purchase-per-view conversion —
    the feature-vector shape model-training joins expect. Implemented
    as conditional aggregation (sum(when(...))) rather than
    DataFrame.pivot so the column set is an explicit contract (pivot
    infers columns with an extra collect pass and makes the schema
    data-dependent — the wrong trade for a pipeline stage).

    One partial-aggregable groupBy, map-only conditionals.

    Returns (key, n_<type>..., n_total, conversion)."""
    aggs = [
        F.sum(F.when(F.col(type_col) == t, 1).otherwise(0))
        .cast("long").alias(f"n_{t}")
        for t in types
    ]
    aggs.append(F.count("*").cast("long").alias("n_total"))
    out = df.groupBy(key_col).agg(*aggs)
    # conversion only resolves when both legs are pivoted columns; a
    # custom `types` tuple without view/purchase gets a NULL column
    # (stable schema) instead of an unresolvable-column error
    if "view" in types and "purchase" in types:
        conv = F.when(
            F.col("n_view") > 0,
            F.round(F.col("n_purchase") / F.col("n_view") + F.lit(1e-9),
                    round_digits),
        ).otherwise(F.lit(None).cast("double"))
    else:
        conv = F.lit(None).cast("double")
    return out.withColumn("conversion", conv)


def histogram_quantiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 64,
    qs: tuple = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Mergeable approximate quantiles from the fixed-bin histogram,
    with the exact quantile and absolute error alongside — the
    calibration readout that says whether n_bins is sized right before
    the exact path is dropped at full scale.

    The sketch IS `value_histogram`'s state: n_bins counters per group,
    partial-aggregable, mergeable across partitions/batches/tiers by
    plain addition. The estimate interpolates linearly inside the bin
    containing rank q*(n-1) (the same 1+q*(n-1) continuous-rank
    definition the exact percentile uses), so error is bounded by the
    bin width — deterministic, engine-replayable arithmetic, unlike
    t-digest whose centroid layout is merge-order-dependent.

    Returns (group, q, n, approx, exact, abs_err). Plan: ONE
    partial-aggregable groupBy onto groups*n_bins rows for the sketch;
    the exact percentile sorts within groups (the value_percentiles
    trade, present here only for the calibration column); the
    interpolation window runs on the bin relation."""
    width = (hi - lo) / n_bins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    bins = (
        df.select(F.col(group_col), b.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wq = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = bins.select(
        group_col,
        "bin",
        "c",
        (F.sum("c").over(wq) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wt).alias("n"),
    )
    q_rows = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    # rank in continuous [0, n-1] space; the target bin is the one whose
    # [cum_before, cum_before + c) count-interval contains it
    probes = cum.select(group_col, "bin", "c", "cum_before", "n", q_rows)
    target = F.col("q") * (F.col("n") - 1)
    inb = probes.where(
        (target >= F.col("cum_before"))
        & ((target < F.col("cum_before") + F.col("c")) | (F.col("cum_before") + F.col("c") == F.col("n")))
    )
    # several bins can satisfy the clause only at the n-boundary; keep
    # the first (lowest bin) deterministically
    wfirst = Window.partitionBy(group_col, "q").orderBy("bin")
    inb = inb.withColumn("_rn", F.row_number().over(wfirst)).where(F.col("_rn") == 1)
    frac = (target - F.col("cum_before")) / F.col("c")
    approx = F.lit(lo) + (F.col("bin") + frac) * F.lit(width)
    exact = df.groupBy(group_col).agg(
        *[
            F.expr(f"percentile({value_col}, {float(q)})").alias(f"_e{i}")
            for i, q in enumerate(qs)
        ]
    )
    exact_long = exact.select(
        group_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(float(q)).alias("q"), F.col(f"_e{i}").alias("exact"))
                for i, q in enumerate(qs)
            ])
        ).alias("s"),
    ).select(group_col, "s.q", "s.exact")
    return (
        inb.select(group_col, "q", "n", approx.alias("_a"))
        .join(exact_long, [group_col, "q"])
        .select(
            group_col,
            "q",
            "n",
            _r(F.col("_a"), round_digits).alias("approx"),
            _r(F.col("exact"), round_digits).alias("exact"),
            _r(F.abs(F.col("_a") - F.col("exact")), round_digits).alias("abs_err"),
        )
    )


def benford_screen(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    mad_flag: float = 0.015,
    round_digits: int = 6,
) -> DataFrame:
    """Benford first-digit conformance screen per group (Newcomb 1881;
    Benford 1938; Nigrini's MAD bands): the leading significant digit
    of a naturally-spread measure follows P(d) = log10(1 + 1/d);
    synthetic, clamped, or fabricated feeds (a stuck sensor, a
    hard-coded retry cost, bot traffic with constant payloads) bend the
    curve. Emits per group the observed digit mix's mean absolute
    deviation from Benford and a flag at the ``mad_flag`` cutoff
    (0.015 = Nigrini's "nonconformity" line for the first digit).

    first_digit = floor(|v| / 10^floor(log10 |v|)) — pure JVM math, no
    string formatting (engine float-printing differs; libm log10/pow
    agree to the ulp on both engines for these magnitudes, and the
    fractions are rounded before comparison). Zero/NULL values carry no
    leading digit and are excluded (reported as n_skipped).

    Physical shape: one map-only digit projection, a (groups x 9)-
    bounded groupBy that partial-aggregates map-side, then the 9-row
    digit spine crossJoins the group totals so missing digits score
    their full expected frequency. Nothing after the projection is
    stream-sized.

    Returns (group, digit, n, obs_frac, exp_frac, abs_dev) plus the
    group-level (n_values, n_skipped, mad, nonconforming) repeated per
    digit row — one relation keeps the oracle join simple.
    """
    v = F.abs(F.col(value_col))
    ok = F.col(value_col).isNotNull() & (v > 0)
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    counts = (
        df.where(ok)
        .select(F.col(group_col), digit.alias("digit"))
        .groupBy(group_col, "digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = (
        df.groupBy(group_col)
        .agg(
            F.sum(ok.cast("long")).cast("long").alias("n_values"),
            F.sum((~ok).cast("long")).cast("long").alias("n_skipped"),
        )
        .where(F.col("n_values") > 0)
    )
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = totals.crossJoin(F.broadcast(spine)).join(
        counts, [group_col, "digit"], "left"
    )
    obs = F.coalesce(F.col("n"), F.lit(0)) / F.col("n_values")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    dev = F.abs(obs - exp)
    per_digit = full.select(
        group_col,
        "digit",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        _r(obs, round_digits).alias("obs_frac"),
        _r(exp, round_digits).alias("exp_frac"),
        _r(dev, round_digits).alias("abs_dev"),
        "n_values",
        "n_skipped",
        dev.alias("_dev"),
    )
    mad = (
        per_digit.groupBy(group_col)
        .agg(_r(F.avg("_dev"), round_digits).alias("mad"))
        .select(
            group_col,
            "mad",
            (F.col("mad") > F.lit(mad_flag)).cast("int").alias("nonconforming"),
        )
    )
    return per_digit.drop("_dev").join(F.broadcast(mad), group_col)


def activity_tail_index(
    df: DataFrame,
    k: int = 100,
    key_col: str = "user_id",
    round_digits: int = 6,
) -> DataFrame:
    """Hill estimator of the actor-activity tail index (Hill 1975): fit
    the Pareto exponent alpha of "events per actor" from the top-k
    order statistics,

        alpha = k / sum_{i=1..k} ln(x_(i) / x_(k+1))

    This is the engine measuring its own skew: alpha <= 1 means the
    busiest actors dominate total volume (salting / per-key caps are
    mandatory, means are meaningless), alpha ~ 2 is classic Zipf
    traffic, large alpha means a light tail where plain hash
    partitioning is fine. ``top_share`` (top-k actors' fraction of all
    events) is the operational readout of the same fact.

    Scale shape: one map-side-combined count per actor, a distributed
    top-(k+1) (TakeOrderedAndProject — per-partition heaps, never a
    global sort), then every remaining relation is k-bounded. Ties at
    the cutoff break by actor id so both engines pick the same set.

    Returns ONE row (k, xmin, alpha, top_share, n_actors, n_events).
    """
    acts = df.groupBy(key_col).agg(F.count("*").cast("long").alias("x"))
    totals = acts.agg(
        F.count("*").cast("long").alias("n_actors"),
        F.sum("x").cast("long").alias("n_events"),
    )
    top = acts.orderBy(F.desc("x"), key_col).limit(k + 1)
    # rank within the k+1-bounded relation (one task by construction)
    from pyspark.sql.window import Window

    wr = Window.orderBy(F.desc("x"), key_col)
    ranked = top.select("x", key_col, F.row_number().over(wr).alias("r"))
    # reference = the DEEPEST available order statistic (rank k+1, or
    # rank n when the population has fewer than k+1 actors — the Hill
    # fit then uses n-1 top stats instead of returning an all-NULL row)
    maxr = Window.partitionBy()
    ranked = ranked.withColumn("_maxr", F.max("r").over(maxr))
    ref = ranked.where(F.col("r") == F.col("_maxr")).select(
        F.col("x").alias("xmin"))
    head = ranked.where(F.col("r") < F.col("_maxr"))
    agg = head.crossJoin(F.broadcast(ref)).agg(
        F.count("*").cast("long").alias("k_used"),
        F.any_value("xmin").alias("xmin"),
        F.sum(F.log(F.col("x") / F.col("xmin"))).alias("lnsum"),
        F.sum("x").cast("long").alias("top_events"),
    )
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            F.col("k_used").alias("k"),
            F.col("xmin").cast("long").alias("xmin"),
            _r(
                F.when(F.col("lnsum") > 0,
                       F.col("k_used").cast("double") / F.col("lnsum")),
                round_digits,
            ).alias("alpha"),
            _r(
                F.col("top_events") / F.col("n_events"), round_digits
            ).alias("top_share"),
            "n_actors",
            "n_events",
        )
    )


def series_health(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
):
    """The per-series monitoring DASHBOARD row: one wide relation
    stitching the diagnostics family into a single readout per actor —
    trend call (Mann-Kendall), whiteness (Ljung-Box), long memory
    (R/S Hurst), random-walk consistency (variance ratio), level drift
    (Page-Hinkley, with the first breach time), and changepoint
    location (CUSUM). Every column is the output of an independently
    oracled operator; this composition is the "what does the fleet
    look like" query an operator runs hourly.

    Plan shape (r7): the raw-event input is projected to the four
    needed columns and materialized ONCE (lazy localCheckpoint) so the
    six diagnostics share a single scan, and the three grid-family
    tests (Mann-Kendall, Hurst, variance ratio) share ONE materialized
    hourly-grid relation — their common sufficient statistic (the same
    (key, hour, rounded mean) grid the streaming head maintains) —
    instead of each re-aggregating raw events. Before this the plan
    held 48 Exchanges over six independent full scans; every join
    stays at actor cardinality, grid-sized, never event-sized.
    """
    from .drift import page_hinkley
    from .longmem import _hourly_grid, hurst_from_grid, variance_ratio_from_grid
    from .trend import mann_kendall_from_grid
    from .tsstats import cusum_changepoint, ljung_box

    k = key_col
    kw = dict(ts_col=ts_col, value_col=value_col)
    narrow = df.select(k, ts_col, value_col, tiebreak_col).localCheckpoint(
        eager=False)
    # shared hourly-grid sufficient statistic (identical expression in
    # trend.mann_kendall / longmem.hurst_rs / longmem.variance_ratio:
    # round(avg(value)+1e-9, 6) per (key, hour))
    grid = _hourly_grid(narrow, [k], ts_col, value_col).localCheckpoint(
        eager=False)
    mk = mann_kendall_from_grid(grid, key_cols=(k,)).select(
        k, "n", F.col("z").alias("trend_z"), "trend")
    lb = ljung_box(narrow, key_col=k, tiebreak_col=tiebreak_col, **kw).select(
        k, F.col("q_stat").alias("lb_q"),
        F.col("reject_white_noise").alias("autocorrelated"))
    hu = hurst_from_grid(grid, key_cols=(k,)).select(k, "hurst")
    vr = variance_ratio_from_grid(grid, key_cols=(k,)).select(
        k, "vr", "random_walk")
    ph = page_hinkley(narrow, key_col=k, tiebreak_col=tiebreak_col, **kw).select(
        k, F.col("drift").alias("level_drift"), "first_breach")
    cu = cusum_changepoint(narrow, key_col=k, tiebreak_col=tiebreak_col,
                           value_col=value_col, ts_col=ts_col).select(
        k, "cp_pos")
    out = mk
    for piece in (lb, hu, vr, ph, cu):
        out = out.join(piece, k, "left")
    return out


# chi-square 95th percentiles for the calendar dimensions' dof
_CHI2_95_CAL = {23: 35.172462, 6: 12.591587}


def calendar_uniformity(
    df,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """Chi-square uniformity test of event load over the two calendar
    dimensions — hour-of-day (dof 23) and day-of-week (dof 6) — per
    key: the significance call on top of hod_profile's descriptive
    shape ("IS there a diurnal/weekly cycle" rather than "what does it
    look like"). Uses the algebraic identity
    X^2 = sum(O^2) * bins / n - n, so missing bins need no spine
    (they contribute 0 to sum(O^2)) and the whole test is two
    partial-aggregable groupBys per dimension, unioned.

    Returns (key, dimension, n, n_bins, x2, crit_5pct, nonuniform).
    Keys with n = 0 cannot occur (no rows, no key); n >= 1 always
    yields a defined statistic.
    """

    def one_dim(bin_col, name, bins):
        counts = (
            df.select(F.col(key_col), bin_col.alias("_b"))
            .groupBy(key_col, "_b").agg(F.count("*").alias("_o"))
        )
        crit = float(_CHI2_95_CAL[bins - 1])
        per = counts.groupBy(key_col).agg(
            F.sum("_o").cast("long").alias("n"),
            F.sum(F.col("_o") * F.col("_o")).alias("_so2"),
        )
        x2 = F.round(
            F.col("_so2") * F.lit(float(bins)) / F.col("n") - F.col("n")
            + F.lit(1e-9), 6)
        return per.select(
            key_col, F.lit(name).alias("dimension"), "n",
            F.lit(bins).cast("int").alias("n_bins"),
            x2.alias("x2"),
            F.lit(crit).alias("crit_5pct"),
            (x2 > crit).alias("nonuniform"),
        )

    hod = one_dim(F.hour(F.col(ts_col)), "hour_of_day", 24)
    dow = one_dim(F.dayofweek(F.col(ts_col)), "day_of_week", 7)
    return hod.unionByName(dow)


def weekend_lift(
    df,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """Weekend-vs-weekday rate lift per key with an exposure-correct
    two-sample Poisson rate test: rates are events per GRID HOUR of
    each class within the key's own [min, max] hour span (a key whose
    span covers two weekends isn't penalized for the calendar), lift
    is the rate ratio, and z = ln(lift) / sqrt(1/n_we + 1/n_wd) — the
    standard log-rate-ratio test whose variance depends only on the
    counts. The hour spine is the same bounded explode the zero-filled
    grids use (span hours, never event volume).

    Returns (key, n_weekend, n_weekday, hours_weekend, hours_weekday,
    lift, z, verdict) with verdict in {'higher','lower','none',
    'insufficient'} at |z| > 1.96 ('insufficient' when either class
    has zero events or zero exposure).
    """
    counts = (
        df.select(F.col(key_col),
                  F.dayofweek(F.col(ts_col)).isin(1, 7).alias("_we"))
        .groupBy(key_col)
        .agg(F.count(F.when(F.col("_we"), 1)).cast("long")
             .alias("n_weekend"),
             F.count(F.when(~F.col("_we"), 1)).cast("long")
             .alias("n_weekday"))
    )
    spine = (
        df.groupBy(key_col)
        .agg(F.min(F.date_trunc("hour", F.col(ts_col))).alias("_h0"),
             F.max(F.date_trunc("hour", F.col(ts_col))).alias("_h1"))
        .select(key_col, F.explode(
            F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR")))
            .alias("_h"))
    )
    expo = spine.groupBy(key_col).agg(
        F.count(F.when(F.dayofweek("_h").isin(1, 7), 1)).cast("long")
        .alias("hours_weekend"),
        F.count(F.when(~F.dayofweek("_h").isin(1, 7), 1)).cast("long")
        .alias("hours_weekday"),
    )
    j = counts.join(expo, key_col)
    ok = ((F.col("n_weekend") > 0) & (F.col("n_weekday") > 0)
          & (F.col("hours_weekend") > 0) & (F.col("hours_weekday") > 0))
    rate_we = F.col("n_weekend") / F.col("hours_weekend")
    rate_wd = F.col("n_weekday") / F.col("hours_weekday")
    lift_raw = rate_we / rate_wd
    se = F.sqrt(1.0 / F.col("n_weekend") + 1.0 / F.col("n_weekday"))
    z = F.when(ok, F.round(F.log(lift_raw) / se + F.lit(1e-9), 6))
    return j.select(
        key_col, "n_weekend", "n_weekday",
        "hours_weekend", "hours_weekday",
        F.when(ok, F.round(lift_raw + F.lit(1e-9), 6)).alias("lift"),
        z.alias("z"),
        F.when(~ok, F.lit("insufficient"))
        .when(z > 1.96, F.lit("higher"))
        .when(z < -1.96, F.lit("lower"))
        .otherwise(F.lit("none")).alias("verdict"),
    )
