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

__all__ = ["bigram_logprob_score"]


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
