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

from .text import _tokens

__all__ = ["bigram_logprob_score", "perplexity_buckets"]


def bigram_logprob_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob) under the corpus's own add-one
    bigram model (see module doc)."""
    toks = _tokens(text_col)
    pairs = F.expr(
        "transform(sequence(1, size(_toks) - 1), "
        "k -> struct(_toks[k-1] AS w1, _toks[k] AS w2))"
    )
    docs_toks = df.select(F.col(id_col), toks.alias("_toks"))
    doc_bigrams = docs_toks.filter(F.size("_toks") >= 2).select(
        id_col, F.explode(pairs).alias("p")
    ).select(id_col, "p.w1", "p.w2")

    uni = (
        docs_toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = doc_bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # V stays LAZY (a broadcast 1-row cross join), keeping the whole
    # computation in ONE plan — an eager uni.count() would be a second
    # action re-running the corpus tokenize/shuffle lineage
    vocab = uni.agg(F.count("*").cast("double").alias("_vocab"))

    logp = F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("_vocab"))
    )
    # skew surface: doc_bigrams ⋈ uni on w1 is Zipf-skewed (stopwords own
    # most of the probability mass) — both sides are equi-join relations
    # with pre-aggregated counts on the dimension side, so AQE's skew-join
    # split handles the hot keys; uni/bi must NOT be broadcast (they are
    # vocabulary-sized, which at corpus scale is GBs) — plan-asserted in
    # tests/test_operators.py::test_lm_count_relations_not_forced_broadcast
    scored = (
        doc_bigrams.join(bi, ["w1", "w2"])
        .join(uni, "w1")
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
