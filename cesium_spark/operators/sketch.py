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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_distinct", "hll_bucket_rows", "hll_estimate_from_buckets"]

# 50-bit rank word (60-bit hash minus the 10 bucket bits at p=10);
# rho ranges 1..(W+1)
_HASH_HEX_CHARS = 15  # 60 bits


def hll_bucket_rows(
    df: DataFrame,
    col: str,
    p: int = 10,
) -> DataFrame:
    """The sketch's mergeable state: per-bucket max rank rows
    (_b int, _rmax int), <= 2^p of them. max is commutative,
    associative, AND idempotent, so states merge across partitions,
    batches, or replayed deliveries by a plain groupBy-max — the
    property the streaming head leans on for exactly-once-free
    correctness."""
    m = 1 << p
    wbits = 4 * _HASH_HEX_CHARS - p  # rank-word width
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, _HASH_HEX_CHARS),
        16, 10,
    ).cast("long")
    src = df.where(F.col(col).isNotNull()).select(h.alias("_h"))
    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        src.select((F.col("_h") % m).alias("_b"), rho.alias("_rho"))
        .groupBy("_b")
        .agg(F.max("_rho").cast("int").alias("_rmax"))
    )


def hll_estimate_from_buckets(
    per_bucket: DataFrame,
    p: int = 10,
    round_digits: int = 2,
) -> DataFrame:
    """Single-row estimate from a (merged) bucket-state relation."""
    m = 1 << p
    wbits = 4 * _HASH_HEX_CHARS - p
    scale = float(1 << (wbits + 1))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # coalesce: an EMPTY bucket relation (no input ever seen) must land
    # in the linear-counting branch with estimate 0, not a NULL sum
    agg = per_bucket.agg(
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
