"""Deterministic cardinality sketching: a HyperLogLog built from
engine-portable primitives (md5 → hex-parse → bucket/rank), so the
SAME estimate is reproducible bit-for-bit by any engine that has md5 —
unlike approx_count_distinct, whose HLL++ sketch is an opaque JVM
binary whose answer can't be independently replayed.

Why this exists at 100 TB: exact distinct counts of high-cardinality
columns (vocabulary size, unique n-grams, unique users) are a full
shuffle of every distinct value; the HLL pass is map-only per
partition down to a fixed 2^p-bucket relation (partial-aggregable
max), one tiny shuffle, and a single-row reduce — constant state no
matter the input size. The determinism discipline:

- 60-bit hash = first 15 hex chars of md5 (the repo's established
  portable-hash idiom, split.py:46); bucket = low p bits' modulus,
  rank = leading-zero count of the remaining 50-bit word via the
  shared bin()-string trick (Spark bin == DuckDB bin: no leading
  zeros, bin(0) = '0').
- The harmonic sum is EXACT integer arithmetic: sum of
  shiftleft(1L, 51 - rho) with rho in [1, 51] over <= 2^p buckets
  stays under 2^62 — both engines sum exact longs, convert the SAME
  integer to double, and divide identical doubles. No
  accumulation-order float drift anywhere before the final round.
- Small-range correction (linear counting) applies below 2.5 m with
  empty buckets, as in Flajolet et al. 2007; the 32-bit large-range
  correction is unnecessary in a 60-bit hash space (documented
  descope — it matters only near 2^60).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_distinct", "hll_bucket_rows", "hll_estimate_from_buckets",
           "cms_counter_rows", "cms_estimate", "cms_heavy_hitters",
           "ddsketch_buckets", "ddsketch_merge", "ddsketch_quantiles",
           "kmv_sketch_rows", "theta_intersection_pairs",
           "DD_ZERO_BKT", "DD_NEG_BASE"]

# 50-bit rank word (60-bit hash minus the 10 bucket bits at p=10);
# rho ranges 1..(W+1)
_HASH_HEX_CHARS = 15  # 60 bits


def hll_bucket_rows(
    df: DataFrame,
    col: str,
    p: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The sketch's mergeable state: per-bucket max rank rows
    (group..., _b int, _rmax int), <= 2^p per group. max is
    commutative, associative, AND idempotent, so states merge across
    partitions, batches, replayed deliveries, or FINER GROUPINGS (day
    states max into month states) by a plain groupBy-max — the
    property the streaming head and the tier cascade lean on."""
    gcols = list(group_cols)
    m = 1 << p
    wbits = 4 * _HASH_HEX_CHARS - p  # rank-word width
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, _HASH_HEX_CHARS),
        16, 10,
    ).cast("long")
    src = df.where(F.col(col).isNotNull()).select(*gcols, h.alias("_h"))
    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        src.select(*gcols, (F.col("_h") % m).alias("_b"), rho.alias("_rho"))
        .groupBy(*gcols, "_b")
        .agg(F.max("_rho").cast("int").alias("_rmax"))
    )


def hll_estimate_from_buckets(
    per_bucket: DataFrame,
    p: int = 10,
    round_digits: int = 2,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Estimate rows from a (merged) bucket-state relation — one row
    per group (a single global row when group_cols is empty: a
    groupBy() with no keys is the global aggregate)."""
    gcols = list(group_cols)
    m = 1 << p
    wbits = 4 * _HASH_HEX_CHARS - p
    scale = float(1 << (wbits + 1))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # coalesce: an EMPTY bucket relation (no input ever seen) must land
    # in the linear-counting branch with estimate 0, not a NULL sum
    agg = per_bucket.groupBy(*gcols).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.coalesce(
            F.expr(
                f"sum(shiftleft(cast(1 as bigint), cast({wbits + 1} - _rmax as int)))"
            ),
            F.lit(0).cast("long"),
        ).alias("_s2"),
    )
    zeros = F.lit(m) - F.col("n_obs")
    s2_total = (
        F.col("_s2") + zeros.cast("long") * F.lit(1 << (wbits + 1)).cast("long")
    ).cast("double")
    raw = F.lit(alpha * m * m * scale) / s2_total
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *gcols,
        F.lit(m).cast("long").alias("m"),
        F.col("n_obs").alias("n_buckets_observed"),
        F.round(est + F.lit(1e-9), round_digits).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 10,
    round_digits: int = 2,
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``col`` (NULLs ignored,
    values hashed as strings). Returns ONE row: (m, n_buckets_observed,
    hll_estimate).

    Plan: map-only hash/bucket/rank projection -> partial-aggregable
    groupBy onto at most 2^p buckets (map-side combine reduces every
    partition to <= 2^p rows before the only shuffle) -> single-row
    final reduce. Executor state is O(2^p) regardless of input rows."""
    return hll_estimate_from_buckets(
        hll_bucket_rows(df, col, p), p, round_digits
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimation in d*w counters. Same determinism discipline as the HLL
# above — row-i bucket = parse(md5(i || ':' || value)[:8]) % w, so any
# md5-capable engine replays the sketch bit-for-bit. The estimate
# min_i(counter[i][h_i(x)]) NEVER undercounts (each counter sums the
# true count plus non-negative collision mass) — the one-sided error
# the heavy-hitters report asserts per row.
#
# Merge semantics: counter states merge by SUM — commutative and
# associative but NOT idempotent, so a replayed delivery double-counts.
# Batch unions may simply groupBy-sum; the streaming head must make
# writes idempotent per source batch (store per-batch partials keyed by
# batch id and overwrite on replay — see streaming/stream.py's CMS
# head), unlike the HLL whose max-merge tolerates replay natively.
# ---------------------------------------------------------------------------

def _cms_bucket(col, row_i: int, w: int):
    """Row-i bucket of a string column: first 32 hash bits of
    md5(i ':' value), mod w — the split.py:46 portable-hash idiom with
    a per-row seed prefix (pairwise-independent enough in practice;
    the classic construction's (a*x+b) mod p needs a numeric x, which
    tokens are not)."""
    key = F.concat(F.lit(f"{row_i}:"), col.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % F.lit(w)).cast("int")


def cms_counter_rows(
    df: DataFrame,
    col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """The sketch's mergeable state: (_row, _b, _n) counter rows,
    <= d*w of them regardless of input size. One map-only projection
    fans each value into its d (row, bucket) cells via an inline
    posexplode of the d bucket expressions (JVM codegen, no UDF), then
    ONE partial-aggregable groupBy — map-side combine collapses every
    partition to <= d*w rows before the only shuffle."""
    src = df.where(F.col(col).isNotNull()).select(F.col(col).alias("_v"))
    cells = F.array(*[
        F.struct(F.lit(i).alias("_row"), _cms_bucket(F.col("_v"), i, w).alias("_b"))
        for i in range(d)
    ])
    return (
        src.select(F.explode(cells).alias("c"))
        .select("c._row", "c._b")
        .groupBy("_row", "_b")
        .agg(F.count("*").cast("long").alias("_n"))
    )


def cms_estimate(
    candidates: DataFrame,
    counters: DataFrame,
    col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-frequency estimates for a candidate relation: each
    candidate joins its d counter cells (broadcast — the counter state
    is <= d*w rows by construction) and takes the min. Missing cells
    read as 0 (a value never inserted). Adds ``cms_est`` to the
    candidate columns."""
    from pyspark.sql.functions import broadcast

    probes = candidates.select(
        "*",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("_row"),
                     _cms_bucket(F.col(col), i, w).alias("_b"))
            for i in range(d)
        ])).alias("_c"),
    ).select("*", "_c._row", "_c._b").drop("_c")
    keep = [c for c in candidates.columns]
    return (
        probes.join(broadcast(counters), ["_row", "_b"], "left")
        .fillna({"_n": 0})
        .groupBy(*keep)
        .agg(F.min("_n").alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 512,
    k: int = 20,
) -> DataFrame:
    """Heavy-hitters report: the corpus's top-k tokens by exact count,
    each with its Count-Min estimate and the (always >= 0) overcount —
    the calibration readout that tells an operator whether d*w is
    sized right before trusting the sketch alone at full scale.

    Returns (rank, token, n_exact, n_est, overcount). The exact
    count relation exists for the report (and the oracle); the
    100 TB deployment keeps only the d*w counter state + a candidate
    stream, exactly what `cms_counter_rows` + `cms_estimate` compose.
    Ranks tie-break lexicographically; top-k via orderBy().limit()
    (TakeOrderedAndProject — per-partition heaps, never a global
    sort)."""
    from cesium_spark.operators.text import _tokens
    from pyspark.sql.window import Window

    toks = df.select(F.explode(_tokens(text_col)).alias("token"))
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("n_exact"))
    top = exact.orderBy(F.col("n_exact").desc(), F.col("token").asc()).limit(k)
    state = cms_counter_rows(toks, "token", d, w)
    est = cms_estimate(top, state, "token", d, w)
    rank_w = Window.orderBy(F.col("n_exact").desc(), F.col("token").asc())
    return (
        est.withColumn("rank", F.row_number().over(rank_w))
        .select(
            "rank", "token", "n_exact",
            F.col("cms_est").alias("n_est"),
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------- DDSketch

# Reserved zero bucket sits below every positive log-bucket (|idx| for a
# double value is at most ~|ln 5e-324|/ln(gamma) ~ 745/ln(gamma), i.e.
# < 2^22 for alpha >= 1e-4) and above every mirrored negative bucket,
# which maps to NEG_BASE - idx(-x) so ordering by bkt IS ordering by
# value across the full signed range.
DD_ZERO_BKT = -(2 ** 30)
DD_NEG_BASE = -(2 ** 30) - 2 ** 23


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_buckets(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch bucket relation (Masson, Lee & Rim, VLDB 2019): a
    relative-error quantile sketch whose bucket mapping is a PURE
    deterministic function of the value — i = ceil(ln(x)/ln(gamma)),
    gamma = (1+alpha)/(1-alpha) — so unlike approx_percentile's opaque
    JVM sketch, the state is an engine-portable relation any engine
    can rebuild and any two sketches MERGE by summing counts.

    Returns (group..., bkt, cnt): map-only projection + ONE hash
    aggregate, bounded by groups x O(log_gamma(max/min)) rows (~1.1k
    buckets for a 5-decade range at alpha=0.01) — constant state at
    any event volume, partial-aggregable, streaming-mergeable.

    Sign handling: x > 0 buckets as above; x == 0 goes to the reserved
    DD_ZERO_BKT; x < 0 mirrors to DD_NEG_BASE - i(-x), a monotone
    embedding strictly below the zero bucket for any double and any
    alpha >= 1e-4 (full DDSketch store semantics, exercised in tests
    even though the events table is non-negative).

    Cross-engine determinism: the log-ratio is rounded to 1e-6 BEFORE
    ceil (bucket width ln(gamma) ~ 2e-2, so the quantization error is
    immaterial, and both engines ceil the identical rounded double —
    the repo's EPS discipline applied to an integer-valued boundary).
    """
    if alpha < 1e-4:
        raise ValueError("ddsketch: alpha < 1e-4 overflows the bucket "
                         "embedding; use a coarser sketch")
    gamma = _dd_gamma(alpha)
    x = F.col(value_col).cast("double")
    lg = F.lit(float(math.log(gamma)))
    idx = lambda v: F.ceil(F.round(F.log(v) / lg, 6)).cast("int")  # noqa: E731
    bkt = (
        F.when(x > 0, idx(x))
        .when(x == 0, F.lit(DD_ZERO_BKT))
        .otherwise(F.lit(DD_NEG_BASE) - idx(-x))
    )
    return (
        df.select(*group_cols, bkt.alias("bkt"))
        .groupBy(*group_cols, "bkt")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def ddsketch_merge(a: DataFrame, b: DataFrame,
                   group_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Merge two bucket relations (the sketch's defining property)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bkt")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def ddsketch_quantiles(
    buckets: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: tuple[str, ...] = ("event_type",),
    alpha: float = 0.01,
    round_digits: int = 6,
) -> DataFrame:
    """Quantile estimates from a (merged) bucket relation.

    For each group and q: rank target = floor(q*(n-1)) + 1 (the
    1-based order statistic DDSketch guarantees), the answering bucket
    is the first whose cumulative count reaches it, and the estimate
    is the bucket's log-midpoint 2*gamma^i/(gamma+1) — relative error
    <= alpha vs the true order statistic by construction (positive
    values; the zero bucket estimates 0, mirrored negatives negate).

    Plan: one tiny window cumsum over the bucket relation (state-sized,
    not data-sized), a broadcast join with the literal qs relation,
    and a struct-min argmin per (group, q).
    """
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bkt")
    cum = buckets.select(
        *gcols, "bkt", "cnt",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*gcols)).alias("_n"),
    )
    qrel = (
        buckets.select(*gcols).distinct()
        .select(*gcols, F.explode(
            F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    )
    target = (F.floor(F.col("q") * (F.col("_n") - 1)) + 1).cast("long")
    cand = (
        cum.join(qrel, gcols)
        .where(F.col("_cum") >= target)
    )
    est_pos = F.lit(2.0) * F.pow(F.lit(gamma), F.col("bkt")) / F.lit(gamma + 1.0)
    est = (
        F.when(F.col("bkt") == DD_ZERO_BKT, F.lit(0.0))
        .when(F.col("bkt") < DD_ZERO_BKT,
              -(F.lit(2.0) * F.pow(F.lit(gamma),
                                   F.lit(DD_NEG_BASE) - F.col("bkt"))
                / F.lit(gamma + 1.0)))
        .otherwise(est_pos)
    )
    pick = F.struct(F.col("bkt").alias("_b"), est.alias("_e"))
    return (
        cand.groupBy(*gcols, "q")
        .agg(F.max(F.col("_n")).alias("n"), F.min(pick).alias("_p"))
        .select(*gcols, "q", F.col("n").cast("long").alias("n"),
                F.round(F.col("_p._e") + F.lit(1e-9), round_digits)
                .alias("est"))
    )


# --------------------------------------------------------- KMV / theta

_KMV_SPACE = float(1 << 60)  # hash space size; theta=2^60 == "exact"


def kmv_sketch_rows(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """The k-minimum-values sketch state per group: the k smallest
    60-bit md5 hashes of the DISTINCT `col` values, as rows
    (group..., _h long, _rk int). KMV/theta sketches (Bar-Yossef et
    al. 2002; Dasgupta et al. 2016) support the SET ALGEBRA HLL
    cannot: intersections and differences, because the retained
    hashes are a uniform sample of the keyspace below theta.

    When a group has fewer than k distinct values the sketch retains
    all of them and is EXACT (theta = 1). The k-smallest step here is
    a row_number window per group — at 10^12 scale swap it for the
    partial k-min aggregate (per-partition slice(array_sort(...), k)
    merged by the same slice), which trades one sort-shuffle for
    mergeable k-arrays; the downstream algebra is unchanged."""
    gcols = list(group_cols)
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, _HASH_HEX_CHARS),
        16, 10,
    ).cast("long")
    distinct = df.where(F.col(col).isNotNull()) \
        .select(*gcols, h.alias("_h")).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy(*gcols).orderBy("_h")
    return (
        distinct.select(*gcols, "_h",
                        F.row_number().over(w).cast("int").alias("_rk"))
        .where(F.col("_rk") <= k)
    )


def theta_intersection_pairs(
    df: DataFrame,
    col: str = "user_id",
    group_col: str = "event_type",
    k: int = 256,
    round_digits: int = 2,
) -> DataFrame:
    """Distinct-set OVERLAP between every pair of groups from ONE KMV
    sketch pass: for groups a < b, the theta-sketch intersection
    estimate |values(a) ∩ values(b)| — the operator HLL cannot
    express (HLL merges are union-only). Exact per-group and pairwise
    counts ride along so the estimator's error is pinned IN the
    result.

    Algebra (all integer comparisons until the final division, so
    both engines compute identical doubles): theta_h = k-th smallest
    hash (2^60 when the sketch is exact); per-group estimate
    (k-1) * 2^60 / theta_h (or the exact retained count);
    intersection theta = min(theta_a, theta_b); estimate =
    |{h in both sketches, h < theta}| * 2^60 / theta.

    Scale: after the sketch pass every relation is (groups x k) rows
    — sketch-sketch and sketch-stats joins all broadcast; the exact
    validation counts are one distinct + one self equi-join on the
    value key (drop them in production; they are the expensive
    part)."""
    gc = group_col
    sk = kmv_sketch_rows(df, col, group_cols=(gc,), k=k)
    stats = sk.groupBy(gc).agg(
        F.count("*").cast("long").alias("n_ret"),
        F.max("_h").alias("_max_h"),
    ).select(
        gc, "n_ret",
        F.when(F.col("n_ret") < k, F.lit(1 << 60))
        .otherwise(F.col("_max_h")).alias("theta_h"),
        F.when(F.col("n_ret") < k, F.col("n_ret").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_SPACE)
                   / F.col("_max_h").cast("double")).alias("est"),
    )
    sa, sb = stats.alias("sa"), stats.alias("sb")
    pairs = sa.join(
        F.broadcast(sb), F.col(f"sa.{gc}") < F.col(f"sb.{gc}")
    ).select(
        F.col(f"sa.{gc}").alias("type_a"), F.col(f"sb.{gc}").alias("type_b"),
        F.least(F.col("sa.theta_h"), F.col("sb.theta_h")).alias("theta_h"),
        F.col("sa.est").alias("est_a"), F.col("sb.est").alias("est_b"),
    )
    ka, kb = sk.alias("ka"), sk.alias("kb")
    common = ka.join(
        F.broadcast(kb),
        (F.col("ka._h") == F.col("kb._h")) & (F.col(f"ka.{gc}") < F.col(f"kb.{gc}")),
    ).select(F.col(f"ka.{gc}").alias("type_a"),
             F.col(f"kb.{gc}").alias("type_b"), F.col("ka._h").alias("_h"))
    ncommon = (
        common.join(F.broadcast(pairs.select("type_a", "type_b", "theta_h")),
                    ["type_a", "type_b"])
        .where(F.col("_h") < F.col("theta_h"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    # exact validation counts (distinct + self equi-join on the value)
    dv = df.where(F.col(col).isNotNull()).select(gc, col).distinct()
    da, db = dv.alias("da"), dv.alias("db")
    exact = da.join(
        db, (F.col(f"da.{col}") == F.col(f"db.{col}"))
        & (F.col(f"da.{gc}") < F.col(f"db.{gc}")),
    ).groupBy(
        F.col(f"da.{gc}").alias("type_a"), F.col(f"db.{gc}").alias("type_b"),
    ).agg(F.count("*").cast("long").alias("exact_inter"))

    eps = F.lit(1e-9)
    est_i = (
        F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
        * F.lit(_KMV_SPACE) / F.col("theta_h").cast("double")
    )
    return (
        pairs.join(ncommon, ["type_a", "type_b"], "left")
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b",
            F.round(F.col("est_a") + eps, round_digits).alias("est_a"),
            F.round(F.col("est_b") + eps, round_digits).alias("est_b"),
            F.round(est_i + eps, round_digits).alias("est_inter"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).alias("exact_inter"),
            F.round(est_i / (F.col("est_a") + F.col("est_b") - est_i) + eps,
                    round_digits + 2).alias("jaccard_est"),
        )
    )
