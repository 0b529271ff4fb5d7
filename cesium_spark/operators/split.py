"""Deterministic hash-based dataset splitting (train/val/test) for
training-data pipelines.

The split decision is a pure function of the row id (+ optional salt):
``bucket = int(md5(id || salt)[:8], 16) % 10000``, carved into
contiguous bucket ranges by the requested fractions. Properties that
matter at corpus scale:

- **stable under growth**: a document's split never changes when the
  corpus is re-ingested or extended — no test-set leakage between
  dataset versions (the failure mode of fraction-based random sampling
  re-drawn per run);
- **engine-portable**: md5 + hex-parse reproduce bit-identically in
  Spark, DuckDB, Python — downstream consumers can re-derive membership
  without the original job;
- **map-only**: no shuffle, no sampling pass, no driver state; the
  expression inlines into whatever scan reads the table.

Fraction→bucket rounding: each boundary is ``round(cum_fraction *
10000)``, so fractions are honored to 1e-4; the final range absorbs
the remainder and a trailing fraction may be padded to cover bucket
9999.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "split_column", "source_mix", "temperature_mix",
           "weighted_sample", "stratified_sample", "split_divergence"]

_BUCKETS = 10_000


def split_column(
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "",
) -> Column:
    """The split label as a pure Column expression (see module doc)."""
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _BUCKETS
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names:
        cum += fractions[name]
        hi = _BUCKETS if name == names[-1] else int(round(cum * _BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic `split` label column to `df`."""
    return df.withColumn(split_col, split_column(id_col, fractions, salt))


def source_mix(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
    default_weight: float = 1.0,
) -> DataFrame:
    """Training-mixture sampling weights per source (the GPT-3 / Pile
    recipe — Brown et al. 2020 table 2.2, Gao et al. 2021 table 1:
    each corpus component is sampled with its own weight, so
    high-quality sources are seen for more than one epoch and bulk web
    data for less than one). ``weights[source] = w`` means every
    document of that source is materialized ``floor(w)`` times plus one
    more with probability ``frac(w)`` — decided by the same
    growth-stable md5 bucket as `hash_split` (per id+salt, so the
    fractional survivors are a fixed, re-derivable subset, not a
    per-run random draw).

    Returns (id, source, n_copies) with n_copies >= 0 — the
    materialization plan a downstream writer expands with
    ``explode(sequence(1, n_copies))`` (kept unexpanded here so the
    relation stays one row per document and the decision is
    SQL-replayable). Map-only: the weight table rides inline as a CASE
    expression (mixture tables are tens of entries), no join, no
    shuffle, inlines into the scan."""
    w_expr = None
    for src, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {src!r}")
        cond = F.col(source_col) == src
        w_expr = (
            F.when(cond, F.lit(float(w)))
            if w_expr is None
            else w_expr.when(cond, F.lit(float(w)))
        )
    w_expr = (
        w_expr.otherwise(F.lit(float(default_weight)))
        if w_expr is not None
        else F.lit(float(default_weight))
    )
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _BUCKETS
    )
    # n = floor(w) + (bucket < round(frac(w) * 10000)): deterministic
    # fractional-epoch oversampling, exact to 1e-4 like split_column
    base = F.floor(w_expr).cast("long")
    frac_hi = F.round(
        (w_expr - F.floor(w_expr)) * _BUCKETS, 0
    ).cast("long")
    n_copies = base + (bucket < frac_hi).cast("long")
    return df.select(
        F.col(id_col),
        F.col(source_col),
        n_copies.alias("n_copies"),
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    id_col: str = "doc_id",
    group_col: str = "lang",
    salt: str = "temp",
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-based sampling weights per group — the multilingual
    mixing recipe of mT5 / XLM-R (Xue et al. 2021 §3.3, Conneau et al.
    2020 §3.1: sample language l with probability proportional to
    p_l^alpha, so low-resource groups are up-sampled without letting
    any one group dominate). With c_g = group count and N = corpus
    size, the realized per-document expected copy count that yields the
    temperature distribution at unchanged total corpus size is

        w_g = N * c_g^(alpha-1) / sum_h c_h^alpha

    (the (c_g/N)^alpha normalizations cancel). alpha=1 reproduces the
    natural distribution (every w_g = 1); alpha=0 equalizes groups.

    Copy realization is identical to `source_mix`: floor(w) copies plus
    one more when the document's growth-stable md5 bucket falls under
    round(frac(w) * 10000) — so membership of the fractional survivors
    is a re-derivable function of (id, salt), not a per-run draw. The
    weight is rounded to `round_digits` BEFORE the floor/frac carve so
    both engines carve identical integers.

    Returns (id, group, weight, n_copies). Plan: one tiny groupBy
    (groups-sized), a scalar normalizer, and a broadcast join back —
    the corpus is touched map-only.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_c"))
    z = counts.agg(
        F.sum(F.pow(F.col("_c").cast("double"), F.lit(float(alpha)))).alias("_z"),
        F.sum("_c").cast("double").alias("_N"),
    )
    weights = counts.crossJoin(F.broadcast(z)).select(
        group_col,
        F.round(
            F.col("_N")
            * F.pow(F.col("_c").cast("double"), F.lit(float(alpha) - 1.0))
            / F.col("_z")
            + F.lit(1e-9),
            round_digits,
        ).alias("weight"),
    )
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _BUCKETS
    )
    base = F.floor(F.col("weight")).cast("long")
    frac_hi = F.round(
        (F.col("weight") - F.floor(F.col("weight"))) * _BUCKETS, 0
    ).cast("long")
    return (
        df.select(id_col, group_col)
        .join(F.broadcast(weights), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("weight"),
            (base + (bucket < frac_hi).cast("long")).alias("n_copies"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    n: int = 100,
    salt: str = "",
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, A-ES): each row draws u ~ U(0,1) from the same
    md5 construction as `hash_split` (u is a pure function of id+salt
    — growth-stable, engine-portable, re-derivable), scores
    key = ln(u) / w, and the n largest keys are the sample. Inclusion
    probability is proportional to weight, no sequential pass, no RNG
    state — the standard one-shot distributed replacement for
    "ORDER BY random() LIMIT n with weights".

    The key is rounded (1e-12 nudge) with id as tiebreak so a
    cross-engine libm ulp on ln cannot flip ranks near the cut.

    Plan: map-only scoring + orderBy(...).limit(n) — Catalyst plans
    TakeOrderedAndProject (per-partition partial top-n, then a single
    n-sized merge on the driver), never a global sort.

    Returns the selected rows: (id, weight, sample_key), key
    descending order NOT materialized (the relation is the contract,
    order is presentation)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                   F.lit(salt))), 1, 15),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w + F.lit(1e-12), round_digits)
    return (
        df.where(w > 0)
        .select(F.col(id_col), w.alias("weight"), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(n)
    )


def stratified_sample(
    df: DataFrame,
    group_col: str = "event_type",
    id_col: str = "event_id",
    n_per_group: int = 50,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sampling: approximately ``n_per_group``
    rows from EACH group, selected by the same growth-stable md5 bucket
    as `hash_split` — a row's membership is a pure function of
    (id, salt) and its group's total, never a per-run random draw.
    The eval-set construction idiom: equal-size strata from wildly
    skewed group sizes (uniform sampling would drown rare groups).

    Per-group keep fraction = min(1, n_per_group / group_count),
    honored to 1e-4 by the bucket grid, so expected stratum size is
    n_per_group with binomial-not-exact membership (exact-n would need
    a per-group rank — a |group|-sized sort; the hash threshold is
    map-only and growth-stable, the right trade at corpus scale).

    Plan: one partial-aggregable count onto the |groups| relation,
    broadcast back onto the stream (group cardinality is small by
    definition of stratification), then a map-only threshold filter —
    the stream itself is never shuffled."""
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("_gn"))
    thresh = F.least(
        F.lit(_BUCKETS),
        F.round(F.lit(float(n_per_group * _BUCKETS)) / F.col("_gn"), 0)
        .cast("long"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16, 10,
        ).cast("long")
        % _BUCKETS
    )
    return (
        df.join(broadcast(counts.select(group_col, thresh.alias("_thr"))),
                group_col)
        .where(bucket < F.col("_thr"))
        .drop("_thr")
    )


def split_divergence(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fractions: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Jensen-Shannon divergence between the unigram token
    distributions of every dataset-split pair — the standard "is my
    held-out set distributionally representative" check a training
    pipeline runs right after `hash_split` (a val set drawn badly — by
    time, by source — shows up as JSD >> the sampling noise floor;
    base-2 JSD is bounded in [0, 1]).

    Token convention matches the corpus oracles: whitespace split of
    trim(text), empty tokens dropped, case preserved. One corpus pass
    builds the (token, split) counts; everything after is VOCAB-sized:
    the per-split counts pivot into one wide relation, totals ride a
    broadcast 1-row crossJoin (the lm.py pattern), and each pair's
    JSD/overlap is one partial-aggregable aggregate over that relation
    — no pair self-join, no second scan.

    Determinism: p and q are ratios of exact integer counts, so every
    log argument is the identical double in both engines; ln itself is
    the only float surface (1-ulp class) and the vocab-sized sum's
    association noise is absorbed by the final round-at-6.

    Returns one row per unordered split pair:
    (split_a, split_b, vocab_a, vocab_b, vocab_overlap, jsd).
    """
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    names = list(fractions)
    labeled = df.select(
        split_column(id_col, fractions, salt).alias("_split"),
        F.explode(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda x: x != F.lit(""))
        ).alias("_tok"),
    )
    wide = labeled.groupBy("_tok").agg(*[
        F.sum(F.when(F.col("_split") == n, F.lit(1)).otherwise(F.lit(0)))
        .cast("double").alias(f"_c_{n}")
        for n in names
    ])
    tot = wide.agg(*[F.sum(f"_c_{n}").alias(f"_t_{n}") for n in names])
    wide = wide.crossJoin(F.broadcast(tot))

    def _kl_half(cn, tn, cm, tm):
        # 0.5 * p * ln(2p / (p + q)), with 0 ln 0 := 0
        p = F.col(cn) / F.col(tn)
        q = F.col(cm) / F.col(tm)
        return F.when(p > 0, F.lit(0.5) * p * F.log(2.0 * p / (p + q))) \
            .otherwise(F.lit(0.0))

    import math as _math

    rows = []
    aggs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ca, ta = f"_c_{a}", f"_t_{a}"
            cb, tb = f"_c_{b}", f"_t_{b}"
            aggs += [
                F.sum(_kl_half(ca, ta, cb, tb) + _kl_half(cb, tb, ca, ta))
                .alias(f"_jsd_{a}_{b}"),
                F.sum(F.when(F.col(ca) > 0, 1).otherwise(0))
                .cast("long").alias(f"_v_{a}_{b}_a"),
                F.sum(F.when(F.col(cb) > 0, 1).otherwise(0))
                .cast("long").alias(f"_v_{a}_{b}_b"),
                F.sum(F.when((F.col(ca) > 0) & (F.col(cb) > 0), 1)
                      .otherwise(0)).cast("long").alias(f"_ov_{a}_{b}"),
            ]
            rows.append((a, b))
    one = wide.agg(*aggs)
    pair_structs = F.array(*[
        F.struct(
            F.lit(a).alias("split_a"), F.lit(b).alias("split_b"),
            F.col(f"_v_{a}_{b}_a").alias("vocab_a"),
            F.col(f"_v_{a}_{b}_b").alias("vocab_b"),
            F.col(f"_ov_{a}_{b}").alias("vocab_overlap"),
            F.round(F.col(f"_jsd_{a}_{b}") / F.lit(_math.log(2.0))
                    + F.lit(1e-9), 6).alias("jsd"),
        )
        for a, b in rows
    ])
    return one.select(F.explode(pair_structs).alias("_r")).select("_r.*")
