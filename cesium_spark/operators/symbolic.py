"""Symbolic / ordinal time-series analysis over event streams:
permutation entropy (Bandt & Pompe 2002, "Permutation entropy: a
natural complexity measure for time series") and SAX motif discovery
(Lin, Keogh, Lonardi & Chiu 2003, "A symbolic representation of time
series, with implications for streaming algorithms").

Both operate on the zero-filled hourly count grid per series key —
an absent hour genuinely means "zero events", so unlike the raw-value
diagnostics in `tsstats.py` the grid here is made REGULAR before any
ordinal structure is read off it (ordinal patterns and PAA windows are
meaningless on a gappy axis). The grid is bounded by the time span,
never by the raw row count: at 100 TB the spine per key is still
hours-between-min-and-max rows, so the explode is rollup-sized.

Plan shape (both operators): one shuffle collapses the raw stream to
the (key, hour) rollup; the spine explode and the zero-fill left join
are rollup-sized; everything after is a single per-key sort window
plus small aggregations — no Python, no collect, no cross joins.

Cross-engine determinism follows the repo discipline: every emitted
double is round(x + 1e-9, 6); z-scores and PAA means are rounded
BEFORE symbol bucketing so the DuckDB oracles replay hash-exactly;
ordinal ties break by position (earlier index ranks first — the
standard stable-argsort convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["hourly_count_grid", "perm_entropy", "sax_motifs", "sax_discords",
           "spectral_power"]


def _r6(col: Column, digits: int = 6) -> Column:
    return F.round(col + F.lit(1e-9), digits)


def hourly_count_grid(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(_k, _h, _i, _y): per-key zero-filled hourly event-count grid.

    One shuffle to the (key, hour) rollup; the hour spine is
    sequence(min, max) per key — exploded rows are bounded by the
    series TIME SPAN, not by data volume, so the fill stays
    rollup-sized at any SF. `_i` is the 0-based hour index.
    """
    hv = (
        df.select(F.col(key_col).alias("_k"),
                  F.date_trunc("HOUR", F.col(ts_col)).alias("_h"))
        .groupBy("_k", "_h")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    spine = (
        hv.groupBy("_k")
        .agg(F.min("_h").alias("_h0"), F.max("_h").alias("_h1"))
        .select("_k", F.explode(
            F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR"))).alias("_h"))
    )
    w = Window.partitionBy("_k").orderBy("_h")
    return (
        spine.join(hv, ["_k", "_h"], "left")
        .select(
            "_k", "_h",
            (F.row_number().over(w) - 1).cast("long").alias("_i"),
            F.coalesce(F.col("_c"), F.lit(0)).cast("double").alias("_y"),
        )
    )


def perm_entropy(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Order-3 permutation entropy per series on the hourly count grid.

    Each consecutive triple (a, b, c) maps to one of 3! = 6 ordinal
    patterns; the entropy of the pattern distribution measures series
    complexity (0 for monotone, ln 6 for white noise) and is the
    standard regime/complexity monitor that needs no amplitude model
    at all. Ties rank by position (earlier first): the rank of element
    i counts elements that are strictly smaller, or equal-and-earlier.

    Returns (key, n_windows, n_patterns, h_perm, h_norm) with
    h_norm = h_perm / ln 6 in [0, 1]; series with fewer than 3 grid
    hours emit nothing. One sort window per key (the two leads fuse
    into a single Window node), then a key×pattern aggregate that is
    partial-aggregable and at most 6 rows per key.
    """
    g = hourly_count_grid(df, key_col, ts_col)
    w = Window.partitionBy("_k").orderBy("_i")
    a, b, c = F.col("_y"), F.lead(F.col("_y"), 1).over(w), F.lead(F.col("_y"), 2).over(w)
    tri = g.select(
        "_k",
        a.alias("_a"),
        b.alias("_b"),
        c.alias("_c"),
    ).where(F.col("_c").isNotNull())
    lt = lambda x, y: F.when(x < y, 1).otherwise(0)  # noqa: E731
    le = lambda x, y: F.when(x <= y, 1).otherwise(0)  # noqa: E731
    A, B, C = F.col("_a"), F.col("_b"), F.col("_c")
    pat = (
        (lt(B, A) + lt(C, A)) * 100
        + (le(A, B) + lt(C, B)) * 10
        + (le(A, C) + le(B, C))
    ).alias("_pat")
    pc = (
        tri.select("_k", pat)
        .groupBy("_k", "_pat")
        .agg(F.count("*").cast("double").alias("_n"))
    )
    tot = Window.partitionBy("_k")
    p = F.col("_n") / F.sum("_n").over(tot)
    ent = (
        pc.select("_k", F.col("_n"), (-p * F.log(p)).alias("_term"))
        .groupBy(F.col("_k").alias(key_col))
        .agg(
            F.sum("_n").cast("long").alias("n_windows"),
            F.count("*").cast("long").alias("n_patterns"),
            _r6(F.sum("_term"), round_digits).alias("h_perm"),
            _r6(F.sum("_term") / F.log(F.lit(6.0)), round_digits).alias("h_norm"),
        )
    )
    return ent


# SAX gaussian breakpoints for alphabet size 4 (Lin et al. 2003 Table 3)
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)
_SAX_SYMS = ("a", "b", "c", "d")


def sax_motifs(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    win: int = 8,
    paa: int = 4,
    top: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top recurring SAX words per series: z-normalize the hourly count
    grid per key, cut it into non-overlapping `win`-hour windows, PAA
    each window down to `paa` segment means, bucket each mean through
    the gaussian breakpoints into an `a..d` symbol, and rank the
    resulting words by frequency — the classic motif-discovery readout
    ("which 8-hour shapes does this series keep repeating?").

    Z-scores and PAA means are rounded before bucketing so the SQL
    oracle replays exactly; constant series (sd = 0) emit nothing
    (shape is undefined); only FULL windows count. Ranking is by
    count desc, then word asc. Returns (key, rank, word, n_windows).

    Plan: grid (one shuffle) → per-key mean/sd via a partition window
    on the grid relation → map-side segment keys → one aggregate to
    (key, window, segment) [win/paa × smaller than the grid] → one to
    (key, window) words → one to (key, word) counts → a bounded
    row_number window. Everything after the grid is sub-rollup-sized.
    """
    counts = _sax_word_counts(df, key_col, ts_col, win, paa, round_digits)
    rw = Window.partitionBy("_k").orderBy(
        F.col("n_windows").desc(), F.col("word"))
    return (
        counts.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top)
        .select(F.col("_k").alias(key_col), "rank", "word", "n_windows")
    )


def _sax_word_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    win: int,
    paa: int,
    round_digits: int,
) -> DataFrame:
    """(_k, word, n_windows, first_win_start): SAX word frequencies per
    key plus the earliest window start hour carrying each word —
    shared by the motif (most frequent) and discord (rarest) readouts.
    """
    if win % paa != 0:
        raise ValueError("win must be a multiple of paa")
    g = hourly_count_grid(df, key_col, ts_col)
    wk = Window.partitionBy("_k")
    sd = F.stddev_samp("_y").over(wk)
    # ANSI-safe: sd = 0 (constant series) -> NULL z -> row filtered
    z = (F.col("_y") - F.avg("_y").over(wk)) / F.when(sd > 0, sd)
    seg = (
        g.select(
            "_k",
            F.floor(F.col("_i") / win).alias("_w"),
            F.floor((F.col("_i") % win) / (win // paa)).alias("_s"),
            _r6(z, round_digits).alias("_z"),
            F.col("_h"),
        )
        .where(F.col("_z").isNotNull())
        .groupBy("_k", "_w", "_s")
        .agg(_r6(F.avg("_z"), round_digits).alias("_m"),
             F.count("*").cast("long").alias("_cnt"),
             F.min("_h").alias("_h0"))
    )
    sym = (
        F.when(F.col("_m") < _SAX_BREAKS[0], _SAX_SYMS[0])
        .when(F.col("_m") < _SAX_BREAKS[1], _SAX_SYMS[1])
        .when(F.col("_m") < _SAX_BREAKS[2], _SAX_SYMS[2])
        .otherwise(_SAX_SYMS[3])
    )
    words = (
        seg.select("_k", "_w", "_s", sym.alias("_sym"), "_cnt", "_h0")
        .groupBy("_k", "_w")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_s", "_sym"))),
                    lambda s: s["_sym"],
                ),
            ).alias("word"),
            F.sum("_cnt").alias("_hrs"),
            F.min("_h0").alias("_wstart"),
        )
        .where(F.col("_hrs") == win)  # full windows only
    )
    return words.groupBy("_k", "word").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.min("_wstart").alias("first_win_start"),
    )


def sax_discords(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    win: int = 8,
    paa: int = 4,
    top: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """SAX discord screening (the HOT SAX intuition at word
    granularity — Keogh, Lin & Fu 2005): the RAREST SAX words per
    series, i.e. the 8-hour shapes the series almost never produces —
    anomaly candidates a monitoring pipeline inspects first. Same
    word relation as `sax_motifs`, ranked by count ASC (ties: word
    asc), each with the earliest hour at which the shape occurred.

    Returns (key, rank, word, n_windows, first_win_start)."""
    counts = _sax_word_counts(df, key_col, ts_col, win, paa, round_digits)
    rw = Window.partitionBy("_k").orderBy(
        F.col("n_windows").asc(), F.col("word"))
    return (
        counts.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top)
        .select(F.col("_k").alias(key_col), "rank", "word", "n_windows",
                "first_win_start")
    )


def spectral_power(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    periods_hours: tuple = (24, 168),
    round_digits: int = 6,
) -> DataFrame:
    """Periodogram ordinates at KNOWN candidate periods (the Goertzel
    single-bin evaluation — no FFT, no resampling): for each period P
    the normalized power

        frac(P) = 2 * (C² + S²) / (n² * σ²_pop),
        C = Σ (y_i - ȳ) cos(2πi/P),  S = Σ (y_i - ȳ) sin(2πi/P)

    which is 1.0 for a pure tone at P and ~0 for white noise — the
    frequency-domain complement of `seasonal_strength` when the
    candidate periods are known a priori (daily / weekly here). This
    is the screening pass a monitoring stack runs before committing to
    a seasonal model; cesium's Lomb-Scargle block answers the
    UNKNOWN-period question on irregular grids (features/lomb.py),
    this answers the known-period one on the regular grid at aggregate
    cost.

    Everything is ONE partial-aggregable groupBy over the grid with
    cos/sin projections computed map-side (the centered form expands
    to raw sums, so no second pass for the mean). Returns
    (key, n_hours, period_hours, power_frac) — one row per
    (key, period); zero-variance series emit NULL power."""
    import math

    g = hourly_count_grid(df, key_col, ts_col)
    aggs = [
        F.count("*").cast("double").alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    ]
    for p in periods_hours:
        w = 2.0 * math.pi / float(p)
        cos_i = F.cos(F.col("_i").cast("double") * F.lit(w))
        sin_i = F.sin(F.col("_i").cast("double") * F.lit(w))
        aggs += [
            F.sum(F.col("_y") * cos_i).alias(f"_yc{p}"),
            F.sum(F.col("_y") * sin_i).alias(f"_ys{p}"),
            F.sum(cos_i).alias(f"_c{p}"),
            F.sum(sin_i).alias(f"_s{p}"),
        ]
    per = g.groupBy(F.col("_k").alias(key_col)).agg(*aggs)
    n, sy = F.col("_n"), F.col("_sy")
    m = sy / n
    varp = F.col("_syy") / n - m * m  # population variance
    rows = []
    for p in periods_hours:
        c = F.col(f"_yc{p}") - m * F.col(f"_c{p}")
        s = F.col(f"_ys{p}") - m * F.col(f"_s{p}")
        frac = F.when(
            varp > 0,
            F.round(2.0 * (c * c + s * s) / (n * n * varp) + F.lit(1e-9),
                    round_digits),
        )
        rows.append(F.struct(
            F.lit(int(p)).cast("int").alias("period_hours"),
            frac.alias("power_frac"),
        ))
    return per.select(
        key_col,
        n.cast("long").alias("n_hours"),
        F.explode(F.array(*rows)).alias("_r"),
    ).select(key_col, "n_hours", "_r.period_hours", "_r.power_frac")
