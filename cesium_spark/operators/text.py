"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in Spark SQL expressions (JVM, codegen) — the
regexes are chosen from the RE2/Java-regex common subset so the DuckDB
oracle can evaluate the *same* pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["text_stats", "quality_score", "lang_id", "fingerprint"]

# Small per-language stopword vocabularies for the n-gram voting heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "de", "por", "para"],
}

PUNCT_CLASS = "[.,!?;:]"


def _word_count(col):
    return F.size(F.split(F.trim(col), "\\s+"))


def _stopword_hits(col, words):
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(1)))


# BPE-ish pre-tokenization: letter runs, digit runs, and isolated
# non-alphanumeric marks — the usual byte-pair pre-split, portable between
# Java regex and RE2
BPE_SPLIT = "([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])"


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document surface statistics: chars, whitespace tokens, BPE-ish
    subword tokens, mean token length, punctuation ratio, stopword ratio
    (en)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = _word_count(t)
    n_bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT), F.lit(1)))
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_stop = _stopword_hits(t, LANG_STOPWORDS["en"])
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(n_chars / n_tokens, 6).alias("mean_token_len"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic [0,1] quality score: length band + stopword presence -
    punctuation excess. Deliberately simple, monotone, and portable."""
    s = text_stats(df, id_col, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
    stop_term = F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.4
    punct_term = F.greatest(
        F.lit(0.2) - F.col("punct_ratio") * F.lit(2.0), F.lit(0.0)
    )
    return s.select(
        id_col,
        F.round(length_term + stop_term + punct_term, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-voting language guess: language with the most stopword
    hits wins; ties broken by language code order; no hits -> 'und'."""
    t = F.lower(F.col(text_col))
    hits = {lang: _stopword_hits(t, words) for lang, words in sorted(LANG_STOPWORDS.items())}
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    # reversed so earlier language codes win ties via later .when override
    for lang in sorted(hits, reverse=True):
        guess = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(guess)
    return df.select(F.col(id_col), guess.alias("lang_guess"))


def winnowing_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003):
    rolling Rabin-Karp hashes of character k-grams, min-sampled per
    window, distinct set per document. Robust to local edits — shared
    fingerprints localize plagiarized/duplicated spans. Vectorized numpy
    per Arrow batch."""
    import numpy as np
    import pandas as pd

    B = np.uint64(1000003)
    MOD_MASK = np.uint64(0xFFFFFFFF)

    def _fp(texts):
        out = []
        for text in texts:
            b = np.frombuffer((text or "").encode("utf-8", "ignore"), dtype=np.uint8)
            n = len(b)
            if n < k:
                out.append([])
                continue
            # rolling hash of all k-grams, vectorized via cumulative trick:
            # h_i = sum b[i+j] * B^(k-1-j); compute with a strided matmul
            powers = np.array(
                [int(pow(int(B), k - 1 - j, 1 << 32)) for j in range(k)],
                dtype=np.uint64,
            )
            windows_view = np.lib.stride_tricks.sliding_window_view(b, k)
            h = (windows_view.astype(np.uint64) * powers).sum(axis=1) & MOD_MASK
            if len(h) >= window:
                mins = np.minimum.reduce(
                    [h[i: len(h) - window + 1 + i] for i in range(window)]
                )
            else:
                mins = np.array([h.min()], dtype=np.uint64)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    udf = F.pandas_udf(_fp, "array<long>")
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("fingerprints"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalization-robust document fingerprint: md5 of the lowercased,
    whitespace-collapsed text. Equal fingerprints = near-identical docs
    modulo case/whitespace."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
