"""The corpus-cleaning verdict composition — ONE implementation of the
five-stage precedence shared by the oracled driver queries
(`clean_corpus`, `clean_corpus_spans`, `training_corpus`) and the
spark-submit jobs (`clean_corpus_job`, `training_set_job`), so the
thresholds, reason strings, and stage order cannot drift between the
deployment entry points and the hash-checked semantics.

Precedence (first failing stage wins):
  contaminated — (if ``decontaminate``) shares any ``contam_n``-token
                window with the held-out evaluation set (Brown et al.
                2020 appendix C — decontamination outranks every other
                stage: a benchmark-leaking document must never survive,
                keeper or not);
  near_dup    — not the min-id keeper of its transitive jaccard
                near-dup cluster;
  span_dup    — (if ``span_k`` and ``span_action="drop"``) more than
                ``span_dup_frac`` of the document's span_k-token windows
                are duplicated corpus-wide (Lee et al. 2022; spans count
                PRE-dedup, so an exact twin's keeper can die here —
                faithful to the paper's raw-corpus substring dedup);
  lang        — stopword-vote guess != ``lang``;
  low_quality — heuristic score < ``min_quality``;
  repetitive  — (if ``repetition``) any Gopher repetition measure over
                its threshold (Rae et al. 2021);
  ppl_tail    — (if ``ppl_tail_group``) the document lands in the
                'tail' perplexity tercile of its group (Wenzek et al.
                2020 §4.4 — CCNet's per-language LM filter, the LAST
                stage because it is a soft typicality prior, not a
                hard defect);
  ok.

``span_action="remove"`` switches the span stage from Lee et al.'s
drop-the-document reading to their deletion recommendation: no document
dies as span_dup; instead every survivor carries ``clean_text`` with
corpus-duplicated span_k-token windows excised
(`remove_duplicate_spans`). All stage measures (quality, lang,
repetition, near-dup) are evaluated on the ORIGINAL text — the stages
are independent corpus-wide measures and the deletion is a final
transform on survivors, so the verdict does not depend on excision
order (and the oracle replays one pass, not a fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_verdict", "with_split"]


def corpus_verdict(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
    jaccard: float = 0.35,
    shingle_cap: int = 1000,
    span_k: int | None = None,
    span_dup_frac: float = 0.5,
    span_action: str = "drop",
    repetition: bool = False,
    decontaminate: DataFrame | None = None,
    contam_n: int = 13,
    ppl_tail_group: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document (id, reason, keep) under the precedence above —
    plus ``clean_text`` when ``span_action="remove"`` (NULL for drops)."""
    from .dedup import (
        duplicate_token_spans,
        ngram_contamination,
        ngram_jaccard_pairs,
        remove_duplicate_spans,
    )
    from .graph import dedup_clusters
    from .text import lang_id, quality_score, repetition_stats

    if span_action not in ("drop", "remove"):
        raise ValueError(f"span_action must be drop|remove, got {span_action!r}")

    clusters = dedup_clusters(
        docs,
        ngram_jaccard_pairs(
            docs, id_col=id_col, text_col=text_col,
            threshold=jaccard, max_shingle_freq=shingle_cap,
        ),
        id_col=id_col,
    )
    joined = (
        docs.select(id_col)
        .join(quality_score(docs, id_col, text_col), id_col)
        .join(lang_id(docs, id_col, text_col), id_col)
        .join(clusters.select(id_col, "is_keeper"), id_col)
    )
    if decontaminate is not None:
        contam = ngram_contamination(
            docs, decontaminate, id_col=id_col, text_col=text_col,
            n=contam_n,
        ).select(id_col, "contaminated")
        joined = joined.join(contam, id_col)
        reason = F.when(F.col("contaminated"), F.lit("contaminated")).when(
            ~F.col("is_keeper"), F.lit("near_dup")
        )
    else:
        reason = F.when(~F.col("is_keeper"), F.lit("near_dup"))
    if span_k is not None and span_action == "drop":
        spans = duplicate_token_spans(
            docs, id_col=id_col, text_col=text_col, k=span_k,
            round_digits=round_digits,
        ).select(id_col, "dup_frac")
        joined = joined.join(spans, id_col)
        reason = reason.when(
            F.col("dup_frac") > span_dup_frac, F.lit("span_dup")
        )
    reason = reason.when(F.col("lang_guess") != lang, F.lit("lang")).when(
        F.col("quality") < min_quality, F.lit("low_quality")
    )
    if repetition:
        joined = joined.join(
            repetition_stats(docs, id_col, text_col)
            .select(id_col, "repetitive"),
            id_col,
        )
        reason = reason.when(F.col("repetitive") == 1, F.lit("repetitive"))
    if ppl_tail_group is not None:
        from .lm import perplexity_buckets

        ppl = perplexity_buckets(
            docs, id_col=id_col, text_col=text_col,
            group_col=ppl_tail_group, round_digits=round_digits,
        ).select(id_col, "bucket")
        joined = joined.join(ppl, id_col)
        reason = reason.when(F.col("bucket") == "tail", F.lit("ppl_tail"))
    reason = reason.otherwise(F.lit("ok"))
    verdict = joined.withColumn("reason", reason).select(
        id_col, "reason", (F.col("reason") == "ok").alias("keep")
    )
    if span_k is not None and span_action == "remove":
        cleaned = remove_duplicate_spans(
            docs, id_col=id_col, text_col=text_col, k=span_k,
            round_digits=round_digits,
        ).select(id_col, "clean_text")
        verdict = verdict.join(cleaned, id_col).select(
            id_col, "reason", "keep",
            F.when(F.col("keep"), F.col("clean_text")).alias("clean_text"),
        )
    return verdict


def with_split(
    verdict: DataFrame,
    id_col: str = "doc_id",
    fractions: dict | None = None,
    salt: str = "",
) -> DataFrame:
    """Append the deterministic md5-bucket split label for survivors
    ('dropped' otherwise)."""
    from .split import split_column

    return verdict.withColumn(
        "split",
        F.when(F.col("reason") != "ok", F.lit("dropped")).otherwise(
            split_column(id_col, fractions, salt)
        ),
    )
