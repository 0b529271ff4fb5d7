"""Corpus-LM document scoring — the CCNet-style quality signal
(Wenzek et al. 2020 score documents by language-model perplexity and
keep the low-perplexity head; here the LM is an add-one-smoothed
bigram model trained on the corpus itself, so the whole pipeline stays
engine-native and oracle-replayable instead of depending on an
external KenLM binary).

Model: P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V),
V = distinct unigram vocabulary. Document score = mean log P over its
bigrams (higher = more typical of the corpus; rank ascending for the
"weird text first" review queue). Documents with fewer than two
tokens score 0 by convention (no bigrams to judge).

Plan shape: ONE corpus pass builds both count relations (the bigram
explode is the same shuffle the dedup/token paths use); scoring joins
the document's bigrams against the count tables — the bigram relation
is vocabulary-bounded (Zipf), never corpus-bounded, and V rides along
as a broadcast scalar. All arithmetic is double with the repo's
round(x + 1e-9, 6) discipline so the DuckDB oracle replays it
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fanout import fan_out
from .text import _tokens

__all__ = ["bigram_logprob_score", "perplexity_buckets", "dsir_select"]


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob) under an add-one bigram model.

    The model is trained on ``train_df`` when given (the DSIR
    cross-corpus scoring path — score raw documents under a TARGET
    corpus's model), else on ``df`` itself (the CCNet self-scoring
    path). Bigrams/unigrams unseen in the training corpus contribute
    count 0, i.e. log((0+1)/(0+V)) for a fully-unseen context — the
    standard add-one treatment."""
    toks = _tokens(text_col)
    pairs = F.expr(
        "transform(sequence(1, size(_toks) - 1), "
        "k -> struct(_toks[k-1] AS w1, _toks[k] AS w2))"
    )

    def _rels(d):
        dt = fan_out(d.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), toks.alias("_toks"))
        bg = dt.filter(F.size("_toks") >= 2).select(
            id_col, F.explode(pairs).alias("p")
        ).select(id_col, "p.w1", "p.w2")
        return dt, bg

    docs_toks, doc_bigrams = _rels(df)
    # NOTE (r7): materializing doc_bigrams once (localCheckpoint) was
    # A/B-tested against letting the training counts and the scoring
    # probe each re-derive the tokenize+explode subtree — recompute won
    # ([5.96, 2.10, 1.65] vs [6.10, 2.19, 1.94] at sf0.1): the map-only
    # tokenize overlaps across plan branches, while the checkpoint
    # inserts a barrier and stores a token-bearing relation. Kept as
    # independent derivations.
    if train_df is None:
        train_toks, train_bigrams = docs_toks, doc_bigrams
    else:
        train_toks, train_bigrams = _rels(train_df)

    uni = (
        train_toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = train_bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # V stays LAZY (a broadcast 1-row cross join), keeping the whole
    # computation in ONE plan — an eager uni.count() would be a second
    # action re-running the corpus tokenize/shuffle lineage
    vocab = uni.agg(F.count("*").cast("double").alias("_vocab"))

    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("_vocab"))
    )
    # skew surface: doc_bigrams ⋈ uni on w1 is Zipf-skewed (stopwords own
    # most of the probability mass) — both sides are equi-join relations
    # with pre-aggregated counts on the dimension side, so AQE's skew-join
    # split handles the hot keys; uni/bi must NOT be broadcast (they are
    # vocabulary-sized, which at corpus scale is GBs) — plan-asserted in
    # tests/test_operators.py::test_lm_count_relations_not_forced_broadcast
    # (left joins so bigrams unseen in the training corpus still score)
    scored = (
        doc_bigrams.join(bi, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp) + F.lit(1e-9), round_digits)
            .alias("avg_logprob"),
        )
    )
    # docs with <2 tokens have no bigrams: convention score 0
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4: rank
    documents by LM perplexity per language and cut the corpus into
    terciles — 'head' trains the model, 'tail' gets dropped or
    down-weighted). Here the LM is the corpus bigram model above, and
    the bucket is assigned by VALUE against the tercile cutoffs, not by
    rank: the two interior percentiles of ``avg_logprob`` (per
    ``group_col`` when given — CCNet buckets per language) are computed
    with one aggregation, rounded, broadcast, and every document is
    labeled map-only (`avg_logprob >= q_hi` -> head, `>= q_lo` ->
    middle, else tail — higher avg log-prob = lower perplexity = more
    corpus-typical).

    Value-based cutoffs instead of ntile(3) is the scale choice: no
    global per-group sort window over the corpus — the only wide stage
    is the percentile aggregation, and the label inlines into the scan.
    (Consequence: equal scores land in the same bucket, so bucket sizes
    are only approximately N/3 under ties — the semantics CCNet's
    published cutoff-file implementation has.) Cross-engine: both
    engines interpolate percentiles at (n-1)*p over the same ROUNDED
    score column, and the cutoffs are rounded before comparison, so the
    DuckDB oracle (quantile_cont) replays the buckets hash-exactly.

    Returns (id[, group], n_bigrams, avg_logprob, bucket)."""
    scored = bigram_logprob_score(df, id_col, text_col, round_digits)
    keys = [group_col] if group_col else []
    if group_col:
        scored = scored.join(df.select(id_col, group_col), id_col)

    def q(p):
        return F.round(
            F.percentile("avg_logprob", F.lit(p)) + F.lit(1e-9), round_digits
        )

    cuts = scored.groupBy(*keys).agg(
        q(1.0 / 3.0).alias("_q_lo"), q(2.0 / 3.0).alias("_q_hi")
    )
    joined = (
        scored.join(F.broadcast(cuts), keys)
        if keys
        else scored.crossJoin(F.broadcast(cuts))
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("_q_hi"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("_q_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        id_col, *keys, "n_bigrams", "avg_logprob", bucket.alias("bucket")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_frac: float = 0.25,
    round_digits: int = 6,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    DSIR): rank raw-corpus documents by the importance log-weight

        w(doc) = log p_target(doc) - log p_raw(doc)

    where both densities are cheap n-gram models — here the same
    add-one bigram model `bigram_logprob_score` uses, trained once on
    the TARGET (high-quality seed) corpus and once on the raw corpus
    itself, each scoring per-bigram average log-probability. A document
    that looks more like the target than like the background raw
    distribution gets a positive weight.

    Selection is the deterministic top-`keep_frac` variant: the weight
    cutoff is the (1 - keep_frac) percentile of the ROUNDED weights
    (computed in one aggregation, broadcast, compared by VALUE — the
    same no-global-sort discipline as `perplexity_buckets`; the paper's
    sampled variant adds Gumbel noise to w, which we drop to keep the
    pipeline replayable). Equal weights land on the same side of the
    cutoff, so the kept set is only approximately keep_frac * N under
    ties.

    Returns (id, n_bigrams, logp_target, logp_raw, weight, selected).
    Documents with < 2 tokens score 0 under both models (weight 0).
    Plan: two LM scoring passes (each one corpus-tokenize + vocabulary-
    bounded count joins, see bigram_logprob_score) + one percentile
    aggregation; nothing corpus-sized is ever broadcast or collected.
    """
    if not 0 < keep_frac <= 1:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    s_t = bigram_logprob_score(
        df, id_col, text_col, round_digits, train_df=target
    ).select(
        id_col,
        "n_bigrams",
        F.col("avg_logprob").alias("logp_target"),
    )
    s_r = bigram_logprob_score(df, id_col, text_col, round_digits).select(
        id_col, F.col("avg_logprob").alias("logp_raw")
    )
    weighted = s_t.join(s_r, id_col).select(
        id_col,
        "n_bigrams",
        "logp_target",
        "logp_raw",
        F.round(
            F.col("logp_target") - F.col("logp_raw") + F.lit(1e-9),
            round_digits,
        ).alias("weight"),
    )
    cut = weighted.agg(
        F.round(
            F.percentile("weight", F.lit(1.0 - keep_frac)) + F.lit(1e-9),
            round_digits,
        ).alias("_cut")
    )
    return weighted.crossJoin(F.broadcast(cut)).select(
        id_col,
        "n_bigrams",
        "logp_target",
        "logp_raw",
        "weight",
        (F.col("weight") >= F.col("_cut")).alias("selected"),
    )
