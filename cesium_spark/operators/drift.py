"""Distribution-drift monitoring: Population Stability Index between a
reference slice and a current slice of an event stream — the standard
"did the data shift under my pipeline" gate (banking scorecards
originally; every production feature store since).

PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref), over bins cut at
the REFERENCE slice's quantiles (so the reference is uniform ~1/bins
by construction and the statistic measures how far the current slice
drifted from it). Common reading: < 0.1 stable, 0.1-0.25 moderate
shift, > 0.25 major shift.

Cross-engine determinism (the repo discipline): bin edges are interior
reference quantiles (linear interpolation — Spark `percentile` and
DuckDB `quantile_cont` share the (n-1)*p definition) rounded to
``round_digits`` with the +1e-9 nudge BEFORE any comparison, bin
assignment is `sum(value > edge)`, and bin fractions are
epsilon-smoothed so empty bins contribute a finite term identically in
both engines.

Plan shape: one aggregation computes every group's edge array (tiny),
broadcast back; bin assignment is a map-only expression; one
(group, side, bin) count + one per-group sum. No windows, no driver
loops; scales with distinct groups x bins, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_by_group", "reference_edges", "bin_index_column",
           "ks_by_group", "page_hinkley", "embedding_drift", "cvm_by_group"]


def reference_edges(
    ref: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """(group, _edges): the interior reference quantiles, rounded with
    the +1e-9 nudge BEFORE any comparison — the frozen per-group bin
    edges both the batch PSI and the streaming PSI head cut against."""
    probs = [i / n_bins for i in range(1, n_bins)]
    return ref.groupBy(group_col).agg(
        F.transform(
            F.percentile(value_col, F.array(*[F.lit(p) for p in probs])),
            lambda e: F.round(e + F.lit(1e-9), round_digits),
        ).alias("_edges")
    )


def bin_index_column(value_col: str = "value", edges_col: str = "_edges"):
    """Bin assignment against an edge array column: sum(value > edge) —
    map-only, shared by batch and streaming binning."""
    return F.aggregate(
        edges_col, F.lit(0),
        lambda acc, e: acc + F.when(F.col(value_col) > e, 1).otherwise(0),
    )


def psi_by_group(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n_ref, n_cur, psi) with bins cut at each group's
    reference quantiles. Groups present in only one side are dropped
    (no reference edges / nothing to compare — surface them with an
    anti-join if absence itself is the signal)."""
    edges = reference_edges(ref, group_col, value_col, n_bins, round_digits)

    def binned(df, side):
        b = df.join(F.broadcast(edges), group_col)
        return b.select(
            group_col, F.lit(side).alias("_side"),
            bin_index_column(value_col).alias("_bin"),
        )

    counts = (
        binned(ref, "ref").unionByName(binned(cur, "cur"))
        .groupBy(group_col, "_side", "_bin")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.groupBy(group_col, "_side").agg(F.sum("n").alias("tot"))
    # every (group, side, bin) cell, including empty ones, via the
    # group x side x [0..n_bins) frame — empty cells get the epsilon
    frame = (
        tot.select(group_col, "_side", "tot")
        .crossJoin(F.broadcast(
            tot.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("_bin"))
        ))
    )
    cells = frame.join(counts, [group_col, "_side", "_bin"], "left").select(
        group_col, "_side", "_bin",
        (F.coalesce(F.col("n"), F.lit(0)) / F.col("tot") + F.lit(eps)).alias("p"),
    )
    p_ref = cells.filter(F.col("_side") == "ref").select(
        group_col, "_bin", F.col("p").alias("p_ref")
    )
    p_cur = cells.filter(F.col("_side") == "cur").select(
        group_col, "_bin", F.col("p").alias("p_cur")
    )
    terms = p_ref.join(p_cur, [group_col, "_bin"]).select(
        group_col,
        ((F.col("p_cur") - F.col("p_ref"))
         * F.log(F.col("p_cur") / F.col("p_ref"))).alias("t"),
    )
    sizes = (
        tot.groupBy(group_col).pivot("_side", ["ref", "cur"]).agg(F.first("tot"))
        .select(group_col, F.col("ref").alias("n_ref"), F.col("cur").alias("n_cur"))
    )
    return (
        terms.groupBy(group_col)
        .agg(F.round(F.sum("t") + F.lit(1e-9), round_digits).alias("psi"))
        .join(sizes, group_col)
        .select(group_col, "n_ref", "n_cur", "psi")
    )


def ks_by_group(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per group:
    D = max over values v of |F_ref(v) - F_cur(v)| with ECDFs evaluated
    at every observed value — the binning-free companion to
    `psi_by_group` (PSI's answer depends on the edge grid; KS is the
    exact sup-distance, the standard second opinion before paging
    anyone). Ties are handled by aggregating to DISTINCT values before
    the cumulative pass, so no within-value ordering can affect either
    engine's answer.

    Returns (group, n_ref, n_cur, ks_d, drifted). Groups present in
    only one side are dropped (no two samples to compare).

    Scale shape: both streams reduce to per-(group, value) count rows
    first (partial-aggregable — the shuffle carries distinct values,
    not events); the cumulative window then sorts only the distinct-
    value relation within each group. That sort is the honest cost of
    an exact sup-statistic; when values are near-continuous at 100 TB,
    quantize value upstream or accept PSI's binned answer."""
    from pyspark.sql.window import Window

    def sided(df, col):
        return (
            df.select(F.col(group_col), F.col(value_col).cast("double").alias("v"))
            .groupBy(group_col, "v")
            .agg(F.count("*").cast("long").alias(col))
        )

    per = (
        sided(ref, "r").join(sided(cur, "c"), [group_col, "v"], "full")
        .fillna({"r": 0, "c": 0})
    )
    w = (
        Window.partitionBy(group_col).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = per.select(
        group_col,
        F.sum("r").over(w).alias("cr"),
        F.sum("c").over(w).alias("cc"),
        F.sum("r").over(wt).alias("nr"),
        F.sum("c").over(wt).alias("nc"),
    )
    agg = (
        cum.where((F.col("nr") > 0) & (F.col("nc") > 0))
        .groupBy(group_col)
        .agg(
            F.max(F.abs(F.col("cr") / F.col("nr") - F.col("cc") / F.col("nc")))
            .alias("_d"),
            F.first("nr").alias("n_ref"),
            F.first("nc").alias("n_cur"),
        )
    )
    d = F.round(F.col("_d") + F.lit(1e-9), round_digits)
    return agg.select(
        group_col,
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        d.alias("ks_d"),
        (d > F.lit(threshold)).alias("drifted"),
    )


def page_hinkley(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    delta: float = 0.005,
    lam: float = 25.0,
    round_digits: int = 6,
) -> DataFrame:
    """Page-Hinkley sequential mean-shift detector per series (Page
    1954; the streaming-drift standard in MOA/river) — the ORDERED
    companion to psi_by_group's distributional snapshot: PSI asks "did
    the histogram move", Page-Hinkley asks "WHEN did the level shift".

    m_t = sum_{s<=t} (x_s - xbar_s - delta) with xbar_s the running
    mean INCLUDING x_s; an upward shift alarms when m_t - min_s m_s
    exceeds `lam`, a downward one when max_s m_s - m_t does. Both
    statistics and the first breach time come from ONE sort-shuffle:
    running mean, the m_t prefix sum, and its running min/max are all
    frames over the same (ts, tiebreak) order, so float addition order
    is pinned identically in both engines (the ordered-prefix-sum
    discipline) — no recursion, no Python, no per-step rounding needed.

    Returns (key, n, ph_inc, ph_dec, drift, first_breach) where
    ph_inc/ph_dec are the detector's end-of-stream statistics,
    first_breach is the earliest event timestamp at which a RUNNING
    statistic crossed `lam` (NULL when none did), and drift is true
    iff a breach happened — the statistic can recede after an alarm,
    so the flag comes from the running scan, not the final values.
    """
    from pyspark.sql import Window

    d = float(delta)
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")
    staged = df.select(
        key_col, ts_col, tiebreak_col,
        (x - F.sum(x).over(wcum) / F.count("*").over(wcum) - F.lit(d))
        .alias("_term"),
    )
    staged = staged.select(
        key_col, ts_col, tiebreak_col,
        F.sum("_term").over(wcum).alias("_m"))
    staged = staged.select(
        key_col, ts_col, "_m",
        F.min("_m").over(wcum).alias("_mn"),
        F.max("_m").over(wcum).alias("_mx"),
        F.row_number().over(w).alias("_rn"),
    )
    r = lambda c: F.round(c + F.lit(1e-9), round_digits)  # noqa: E731
    per = staged.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.max(F.struct("_rn", "_m"))["_m"].alias("_m_last"),
        F.min("_m").alias("_min_m"),
        F.max("_m").alias("_max_m"),
        F.min(F.when(
            (r(F.col("_m") - F.col("_mn")) > lam)
            | (r(F.col("_mx") - F.col("_m")) > lam),
            F.col(ts_col),
        )).alias("first_breach"),
    )
    ph_inc = r(F.col("_m_last") - F.col("_min_m"))
    ph_dec = r(F.col("_max_m") - F.col("_m_last"))
    # the detector alarms at the FIRST crossing — the running statistic
    # can recede afterwards, so `drift` derives from the breach scan,
    # not from the end-of-stream statistics (which are still reported
    # as the detector's current state)
    return per.select(
        key_col, "n",
        ph_inc.alias("ph_inc"), ph_dec.alias("ph_dec"),
        F.col("first_breach").isNotNull().alias("drift"),
        "first_breach",
    )


def embedding_drift(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "drift",
    round_digits: int = 6,
) -> DataFrame:
    """Per-dimension embedding drift between two deterministic halves
    of the corpus (md5 split on the id, the dataset_split primitive):
    standardized mean difference smd_d = (mean_cur - mean_ref) /
    sqrt(var_ref + 1e-9) per dimension — the embedding-space twin of
    psi_by_group that model-monitoring stacks run on representation
    columns (a retrained encoder or an upstream text shift shows up as
    |smd| >> the sampling floor on specific dimensions).

    One posexplode + one partial-aggregable groupBy on the dimension
    index (dims groups; map-side combine collapses each partition to
    dims rows). Float32 elements are cast to double from identical
    bits in both engines; only the final mean/smd round.

    Returns (pos, n_ref, n_cur, mean_ref, mean_cur, smd).
    """
    from .split import split_column

    side = split_column(id_col, {"ref": 0.5, "cur": 0.5}, salt)
    ex = emb.select(
        side.alias("_side"),
        F.posexplode(F.col(vec_col)).alias("pos", "_v"),
    ).select("_side", "pos", F.col("_v").cast("double").alias("_v"))
    isr = F.col("_side") == "ref"
    per = ex.groupBy("pos").agg(
        F.count(F.when(isr, 1)).cast("long").alias("n_ref"),
        F.count(F.when(~isr, 1)).cast("long").alias("n_cur"),
        F.sum(F.when(isr, F.col("_v"))).alias("_sr"),
        F.sum(F.when(isr, F.col("_v") * F.col("_v"))).alias("_srr"),
        F.sum(F.when(~isr, F.col("_v"))).alias("_sc"),
    )
    mr = F.col("_sr") / F.col("n_ref")
    mc = F.col("_sc") / F.col("n_cur")
    var_r = F.col("_srr") / F.col("n_ref") - mr * mr
    r = lambda c: F.round(c + F.lit(1e-9), round_digits)  # noqa: E731
    return per.select(
        F.col("pos").cast("int").alias("pos"), "n_ref", "n_cur",
        r(mr).alias("mean_ref"), r(mc).alias("mean_cur"),
        F.when((F.col("n_ref") > 0) & (F.col("n_cur") > 0),
               r((mc - mr) / F.sqrt(var_r + F.lit(1e-9)))).alias("smd"),
    )


def cvm_by_group(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 0.461,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Cramér-von Mises drift statistic per group: the
    INTEGRATED squared ECDF distance — where KS pages on the worst
    single point, CvM pages on the accumulated discrepancy, so a broad
    mild shift that never produces a large sup-gap still registers.
    Tie-respecting form on the distinct-value relation:

        T = (n m / N^2) * sum_k (F_ref(v_k) - F_cur(v_k))^2 * w_k

    with w_k the pooled count at distinct value v_k and N = n + m;
    the asymptotic 5% critical value is 0.461 (Anderson 1962).

    Same scale shape as ks_by_group: both streams reduce to
    per-(group, value) counts first, one distinct-value sort per
    group. Returns (group, n_ref, n_cur, cvm_t, drifted); one-sided
    groups are dropped.
    """
    from pyspark.sql.window import Window

    def sided(df, col):
        return (
            df.select(F.col(group_col),
                      F.col(value_col).cast("double").alias("v"))
            .groupBy(group_col, "v")
            .agg(F.count("*").cast("long").alias(col))
        )

    per = (
        sided(ref, "r").join(sided(cur, "c"), [group_col, "v"], "full")
        .fillna({"r": 0, "c": 0})
    )
    w = (
        Window.partitionBy(group_col).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = per.select(
        group_col, "r", "c",
        F.sum("r").over(w).alias("_cr"),
        F.sum("c").over(w).alias("_cc"),
        F.sum("r").over(wt).alias("_n"),
        F.sum("c").over(wt).alias("_m"),
    )
    d = (F.col("_cr") / F.col("_n") - F.col("_cc") / F.col("_m"))
    agg = (
        cum.where((F.col("_n") > 0) & (F.col("_m") > 0))
        .groupBy(group_col)
        .agg(
            F.max("_n").cast("long").alias("n_ref"),
            F.max("_m").cast("long").alias("n_cur"),
            F.sum(d * d * (F.col("r") + F.col("c"))).alias("_s"),
        )
    )
    nn, mm = F.col("n_ref"), F.col("n_cur")
    t = F.round(
        nn * mm / ((nn + mm) * (nn + mm)) * F.col("_s") + F.lit(1e-9),
        round_digits)
    return agg.select(
        group_col, "n_ref", "n_cur",
        t.alias("cvm_t"),
        (t > threshold).alias("drifted"),
    )
