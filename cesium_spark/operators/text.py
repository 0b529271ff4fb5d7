"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in Spark SQL expressions (JVM, codegen) — the
regexes are chosen from the RE2/Java-regex common subset so the DuckDB
oracle can evaluate the *same* pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fanout import fan_out

__all__ = [
    "text_stats", "quality_score", "lang_id", "fingerprint",
    "token_topk", "tfidf_top_terms", "repetition_stats", "bm25_topk",
    "c4_line_filter", "gopher_quality_filter", "normalize_text",
    "script_profile", "inverted_index", "token_pmi", "chunk_documents",
    "chunk_dup_stats",
]

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
    # map-only regex pass: fan out single-split scans so the per-doc
    # regex work uses every core (no-op on well-split tables)
    return fan_out(df).select(
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
    return fan_out(df).select(F.col(id_col), guess.alias("lang_guess"))


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
    return fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), udf(F.col(text_col)).alias("fingerprints"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalization-robust document fingerprint: md5 of the lowercased,
    whitespace-collapsed text. Equal fingerprints = near-identical docs
    modulo case/whitespace."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return fan_out(df).select(F.col(id_col), F.md5(norm).alias("fingerprint"))


#: Gopher (Rae et al. 2021, table A1) repetition-removal thresholds: a
#: document is flagged repetitive when any measure exceeds its bound.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
}


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
    thresholds: dict | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Gopher-style repetition quality measures (Rae et al. 2021 §A.1.1,
    the MassiveText repetition filters) per document:

    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier-seen line ((total - distinct) / total).
    - ``dup_line_char_frac``: characters inside lines occurring >= 2
      times (all occurrences), over total characters.
    - ``top_{n}gram_char_frac`` for n in ``top_ns``: the maximal
      character coverage of any single REPEATED word n-gram
      (occurrences x gram length / total chars, clamped to 1 because
      overlapping occurrences re-count shared characters). Gopher uses
      the coverage of the *most frequent* n-gram even when nothing
      repeats; restricting to cnt >= 2 keeps the measure zero on
      repetition-free text (short docs would otherwise trip the
      threshold on a single long unique gram) and max-coverage is
      tie-stable across engines — same monotone repetition signal,
      no tie-break dependence.
    - ``dup_{n}gram_char_frac`` for n in ``dup_ns``: characters covered
      by all n-grams occurring >= 2 times (occurrence-summed, the
      NeMo-Curator/Dolma reproduction of Gopher's duplicated-n-gram
      measure — exact overlap-deduped coverage needs per-position
      interval union, which no engine does in aggregate form).
    - ``repetitive``: 1 when any measure exceeds its threshold
      (defaults: ``GOPHER_REPETITION_THRESHOLDS``).

    Plan shape — built for the 100 TB corpus: every measure is a pure
    per-document function, so the whole operator is ONE map-only
    vectorized Arrow pass (zero shuffles, embarrassingly parallel;
    grams never leave their document). An earlier explode +
    (doc, n, unit) hash-aggregation formulation was 24x slower at
    sf0.1 (12.7 s -> 0.5 s): higher-order gram construction runs
    interpreted JVM-side and the million-row unit relation bought
    nothing — per-doc Counter state is bounded by document length.
    Cross-engine float discipline unchanged (round(x + 1e-9, 6),
    clamps), so the DuckDB oracle is untouched."""
    import pandas as pd

    thresholds = dict(GOPHER_REPETITION_THRESHOLDS if thresholds is None else thresholds)
    top_list = sorted(top_ns)
    dup_list = sorted(dup_ns)
    names = (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top_list]
        + [f"dup_{n}gram_char_frac" for n in dup_list]
    )
    rd = round_digits

    def rep_fn(texts):
        import re
        from collections import Counter

        # the engine tokenization contract (see _tokens): ASCII \s+
        # split of the space-trimmed text — NOT Python str.split(),
        # whose Unicode whitespace (\xa0 etc.) and empty-dropping
        # would diverge from the DuckDB oracle's regexp_split_to_array
        ws = re.compile(r"\s+", re.ASCII)

        out = []
        for txt in texts:
            txt = txt or ""
            nc = len(txt)

            def frac(num, den):
                v = (num / den) if den else 0.0
                return round(min(v, 1.0) + 1e-9, rd)

            lines = Counter(txt.split("\n"))
            tot = sum(lines.values())
            vals = [
                frac(tot - len(lines), tot),
                frac(sum(c * len(l) for l, c in lines.items() if c >= 2), nc),
            ]
            toks = ws.split(txt.strip(" "))
            for n in top_list:
                c = Counter(
                    " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
                )
                top = max(
                    (cnt * len(g) for g, cnt in c.items() if cnt >= 2),
                    default=0,
                )
                vals.append(frac(top, nc))
            for n in dup_list:
                c = Counter(
                    " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
                )
                dup = sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)
                vals.append(frac(dup, nc))
            out.append(vals)
        return pd.DataFrame(out, columns=names)

    rep_udf = F.pandas_udf(rep_fn, ", ".join(f"{n} double" for n in names))
    # per-doc Counter work is the whole cost: fan out single-split scans
    # so the Arrow pass uses every core (no-op on well-split tables)
    out = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), rep_udf(F.col(text_col)).alias("_m")
    ).select(id_col, "_m.*")
    flag = F.lit(False)
    for name, bound in thresholds.items():
        if name in names:
            flag = flag | (F.col(name) > F.lit(float(bound)))
    return out.withColumn("repetitive", flag.cast("int"))


def _tokens(text_col: str):
    """Lowercased whitespace tokens, empties dropped — JVM codegen, and
    the \\s+ class matches DuckDB's string_split_regex exactly."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def token_topk(
    df: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k tokens by occurrence count (rank, token, count),
    ties broken lexicographically — the vocabulary/heavy-hitters pass of
    a training-data pipeline. Plan: explode -> ONE hash aggregation
    (map-side combined, shuffle carries one row per distinct token per
    partition) -> global top-k. At 100 TB the exact groupBy IS the right
    tool: token vocabularies are millions of rows, trivially shuffleable;
    sketches only pay off when per-key state must stay bounded
    per-executor (streaming), not for a batch count."""
    from pyspark.sql.window import Window

    counts = (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # heaps + a k-row merge, never a single-partition sort of the whole
    # vocabulary (a global row_number() window would pull every distinct
    # token into one task). The rank window then runs on k rows only.
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "n")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document top-k terms by tf-idf (doc_id, rank, token, tfidf):
    tf = raw occurrence count in the document, idf = ln((N+1)/(df+1)) + 1
    (the smoothed sklearn form — never zero, no division by zero on
    unseen terms). Ranking ties break lexicographically so the result is
    deterministic across engines and partitionings.

    Plan: one explode + (doc, token) count, one token-level document-
    frequency aggregation, N as a broadcast scalar — three narrow
    aggregations, no UDFs. The (doc, token) relation is the fat one and
    is only ever aggregated, never self-joined."""
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(id_col).distinct().count()  # scalar, one job
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    # +1e-9 before rounding (the repo-wide cross-engine convention): Spark
    # rounds HALF_UP, DuckDB half-even — the nudge makes an exact-midpoint
    # double round the same way in both engines, and the RANK is computed
    # on this rounded value, so rank ties also resolve identically.
    scored = tf.join(dfreq, "token").select(
        id_col, "token",
        F.round(F.col("tf") * idf + F.lit(1e-9), round_digits).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tfidf")
    )


def bm25_topk(
    df: DataFrame,
    query: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """BM25 retrieval: score every document against a bag-of-words query
    and return the top k — the classic sparse-retrieval primitive
    (Robertson & Zaragoza 2009), and the first stage of retrieval-based
    dataset curation / RAG corpus audits. Uses the Lucene-standard
    non-negative idf, idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)),
    and the usual saturation/length normalization

        score = sum_t idf_t * tf_t * (k1+1)
                      / (tf_t + k1 * (1 - b + b * dl / avgdl)).

    Returns (rank, id, n_hit_terms, score) for the top k documents with
    score > 0; ties on the ROUNDED score break by id ascending, so the
    ranking is deterministic across engines and partitionings.

    Plan: per-term tf is size(filter(tokens, = term)) — a JVM expression
    per query term, no explode, no (doc, token) relation; corpus stats
    (N, avgdl, every df_t) come from ONE aggregate and ride along as a
    broadcast 1-row crossJoin; the top-k is orderBy().limit(k) =
    TakeOrderedAndProject (per-partition heaps, never a global sort).
    Two narrow scans of the corpus total — at 100 TB the scoring pass
    is map-only behind the broadcast stats row.
    """
    from pyspark.sql.window import Window

    terms = sorted({t.lower() for t in query if t and t.strip()})
    if not terms:
        raise ValueError("query must contain at least one non-empty term")
    toks = _tokens(text_col)

    def _tf(term):
        # NB: a (x, t=t) default-arg lambda would be read by PySpark as
        # the two-argument (element, index) form — capture via closure
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("_dl"),
        *[
            _tf(t).cast("double").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("_N"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    score = None
    hits = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_N") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        term_score = (
            idf
            * F.col(f"_tf{i}")
            * F.lit(k1 + 1.0)
            / (F.col(f"_tf{i}") + norm)
        )
        contrib = F.when(F.col(f"_tf{i}") > 0, term_score).otherwise(F.lit(0.0))
        hit = (F.col(f"_tf{i}") > 0).cast("long")
        score = contrib if score is None else score + contrib
        hits = hit if hits is None else hits + hit
    out = scored.select(
        F.col(id_col),
        hits.alias("n_hit_terms"),
        F.round(score + F.lit(1e-9), round_digits).alias("score"),
    ).filter(F.col("score") > 0)
    top = out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "n_hit_terms", "score"
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    bad_words: tuple = ("badword", "obscenity"),
    round_digits: int = 6,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) — the
    line- and page-level rules the original corpus applied before any
    statistical filtering:

    line rules (a line survives iff ALL hold):
      - ends in a terminal punctuation mark ('.', '!', '?', '"')
        after right-trim;
      - contains at least `min_words_per_line` whitespace words;
      - does not contain the word "javascript" (case-insensitive).
    page rules (evaluated on the ORIGINAL text, first match is the
    reason, precedence mirroring the paper's discard list; a NULL text
    is its own reason 'null_text' and never kept):
      - `bad_words`: any listed word present (word-boundary regex
        match, not substring) -> reason 'bad_words';
      - the phrase "lorem ipsum" -> 'lorem_ipsum';
      - a curly brace '{' (code) -> 'code';
      - fewer than `min_lines` surviving lines -> 'too_few_lines';
      - else 'ok'.

    Returns (id, n_lines, n_kept, kept_frac, reason, keep,
    clean_text) where clean_text joins the surviving lines for kept
    pages and is NULL otherwise. Everything is JVM expressions over
    one projection — 0 Exchanges, the filter inlines into the scan; at
    100 TB this is a pure map stage like redact_pii.
    """
    lines = F.split(F.col(text_col), "\n")
    lw = F.lower(F.col(text_col))

    def _line_ok(l):
        t = F.trim(l)
        words = F.filter(
            F.split(t, r"\s+"), lambda x: x != F.lit("")
        )
        ends_ok = F.substring(F.rtrim(l), -1, 1).isin(".", "!", "?", '"')
        has_words = F.size(words) >= min_words_per_line
        no_js = ~F.lower(l).contains("javascript")
        return ends_ok & has_words & no_js

    kept = F.filter(lines, _line_ok)
    bad = None
    for w in sorted(bad_words):
        # word-boundary match (the C4 implementation's semantics), not
        # raw substring — 'class' must not trip a blocklisted 'ass'
        hit = lw.rlike(r"\b" + w.lower() + r"\b")
        bad = hit if bad is None else (bad | hit)
    if bad is None:
        bad = F.lit(False)
    reason = (
        F.when(F.col(text_col).isNull(), F.lit("null_text"))
        .when(bad, F.lit("bad_words"))
        .when(lw.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(F.col(text_col).contains("{"), F.lit("code"))
        .when(F.size(kept) < min_lines, F.lit("too_few_lines"))
        .otherwise(F.lit("ok"))
    )
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    kept_frac = F.round(
        F.when(n_lines > 0, n_kept / n_lines).otherwise(F.lit(0.0))
        + F.lit(1e-9),
        round_digits,
    )
    return fan_out(df).select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        kept_frac.alias("kept_frac"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
        F.when(reason == "ok", F.array_join(kept, "\n")).alias("clean_text"),
    )


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    required_stopwords: tuple = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    min_stopword_hits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, Table A1) —
    the heuristic companion to `repetition_stats` (which carries the
    same paper's repetition table). First failing rule is the reason,
    in the paper's order:

      too_few_words / too_many_words  word count outside [min, max]
      word_length    mean word length outside [3, 10]
      symbol_ratio   ('#' + ellipsis) per word > 0.1
      bullet_lines   > 90% of non-empty lines start with a bullet
      ellipsis_lines > 30% of non-empty lines end with an ellipsis
      non_alpha_words< 80% of words contain an alphabetic character
      stopwords      fewer than `min_stopword_hits` of the required
                     stopword list appear in the document
    (a NULL text short-circuits to reason 'null_text', never kept)

    Everything is built-in string/array expressions in one projection —
    zero Exchanges, zero Python (same map-only class as c4_line_filter
    / redact_pii); at 100 TB it fuses into whatever scan feeds it.
    Ellipsis counting treats each '…' and each non-overlapping
    '...' as one unit (replace()-delta arithmetic, identical in DuckDB).
    """
    txt = F.col(text_col)
    words = F.filter(F.split(txt, r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words).cast("long")
    total_len = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"), lambda a, x: a + x.cast("long"),
    )
    mean_wl = F.when(n_words > 0, total_len / n_words)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_uni_ell = (
        F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit("")))
    )
    n_dot_ell = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    sym_ratio = F.when(
        n_words > 0, (n_hash + n_uni_ell + n_dot_ell) / n_words
    )
    lines = F.filter(
        F.split(txt, "\n"), lambda l: F.trim(l) != F.lit("")
    )
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(lines, lambda l: (
        F.startswith(F.trim(l), F.lit("•"))
        | F.startswith(F.trim(l), F.lit("- "))
        | F.startswith(F.trim(l), F.lit("* "))
    )))
    n_ell_end = F.size(F.filter(lines, lambda l: (
        F.endswith(F.rtrim(l), F.lit("…"))
        | F.endswith(F.rtrim(l), F.lit("..."))
    )))
    bullet_frac = F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))
    ell_frac = F.when(n_lines > 0, n_ell_end / n_lines).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n_words > 0, n_alpha / n_words)
    words_l = F.transform(words, F.lower)
    n_stop = None
    for w in required_stopwords:
        hit = F.array_contains(words_l, w).cast("int")
        n_stop = hit if n_stop is None else (n_stop + hit)
    n_stop = (n_stop if n_stop is not None else F.lit(0)).cast("long")

    reason = (
        F.when(txt.isNull(), F.lit("null_text"))
        .when(n_words < min_words, F.lit("too_few_words"))
        .when(n_words > max_words, F.lit("too_many_words"))
        .when((mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
              F.lit("word_length"))
        .when(sym_ratio > max_symbol_ratio, F.lit("symbol_ratio"))
        .when(bullet_frac > max_bullet_frac, F.lit("bullet_lines"))
        .when(ell_frac > max_ellipsis_frac, F.lit("ellipsis_lines"))
        .when(alpha_frac < min_alpha_frac, F.lit("non_alpha_words"))
        .when(n_stop < min_stopword_hits, F.lit("stopwords"))
        .otherwise(F.lit("ok"))
    )

    def _r(c):
        return F.round(c + F.lit(1e-9), round_digits)

    return fan_out(df).select(
        F.col(id_col),
        n_words.alias("n_words"),
        _r(mean_wl).alias("mean_word_len"),
        _r(sym_ratio).alias("symbol_ratio"),
        _r(bullet_frac).alias("bullet_frac"),
        _r(ell_frac).alias("ellipsis_frac"),
        _r(alpha_frac).alias("alpha_frac"),
        n_stop.alias("n_stop_hits"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Unicode-canonical text normalization — the first stage of every
    multilingual curation pipeline (CCNet/ROOTS): NFC composition, then
    optional lowercasing and whitespace collapse (runs of whitespace to
    one space, ends trimmed).

    NFC has no JVM builtin, so it runs as ONE vectorized Arrow pass
    (unicodedata.normalize per batch — the sanctioned Python path);
    lowercase/collapse stay JVM expressions so the plan is
    ArrowEval -> projection, still zero Exchanges and scan-fused.
    DuckDB's nfc_normalize/lower/regexp_replace replay it exactly
    (verified on decomposed accents and multi-space runs).

    Returns (id, text_norm, changed, n_chars_before, n_chars_after).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    # no type hints: under `from __future__ import annotations` they are
    # strings pandas_udf cannot resolve (pd is function-local here)
    _nfc = pandas_udf(_nfc_fn, "string")

    out = _nfc(F.col(text_col))
    if lower:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return fan_out(df).select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        out.alias("text_norm"),
    ).select(
        id_col,
        "text_norm",
        (F.col("_orig") != F.col("text_norm")).alias("changed"),
        F.length("_orig").cast("long").alias("n_chars_before"),
        F.length("text_norm").cast("long").alias("n_chars_after"),
    )


def script_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Character-class composition per document — the script-detection
    signal multilingual pipelines route on before any model-based
    language ID: fractions of Latin letters, ASCII digits, Cyrillic
    (U+0400..U+04FF), CJK unified ideographs (U+4E00..U+9FFF), and
    whitespace, plus the dominant script with a fixed precedence
    (latin > cyrillic > cjk, 'none' when no letters).

    Counting is replace()-delta arithmetic over explicit literal
    character ranges (NOT \\s/\\w classes, whose definitions differ
    between Java regex and RE2) — pure JVM expressions, zero
    Exchanges, identical in the DuckDB replay.
    """
    txt = F.col(text_col)
    n = F.length(txt).cast("long")

    def cnt(cls):
        return F.length(F.regexp_replace(txt, f"[^{cls}]", "")).cast("long")

    lat = cnt("a-zA-Z")
    dig = cnt("0-9")
    cyr = cnt("Ѐ-ӿ")
    cjk = cnt("一-鿿")
    ws = cnt(" \t\n\r")

    def frac(c):
        return F.round(
            F.when(n > 0, c / n).otherwise(F.lit(0.0)) + F.lit(1e-9),
            round_digits,
        )

    main = (
        F.when(txt.isNull() | (lat + cyr + cjk == 0), F.lit("none"))
        .when((lat >= cyr) & (lat >= cjk), F.lit("latin"))
        .when(cyr >= cjk, F.lit("cyrillic"))
        .otherwise(F.lit("cjk"))
    )
    return fan_out(df).select(
        F.col(id_col),
        n.alias("n_chars"),
        frac(lat).alias("latin_frac"),
        frac(dig).alias("digit_frac"),
        frac(cyr).alias("cyrillic_frac"),
        frac(cjk).alias("cjk_frac"),
        frac(ws).alias("ws_frac"),
        main.alias("main_script"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Posting-list inverted index over the corpus: one row per
    retained token with its document frequency and the SORTED posting
    list (comma-joined string — a canonical, order-stable serialization
    any engine reproduces byte-for-byte). Tokens below ``min_df`` are
    hapax noise; tokens above ``max_df`` are stopwords whose posting
    lists approach the corpus size — both pruned, which is what keeps
    per-token state bounded (the same df-band discipline tfidf and the
    dedup shingle ops use).

    Plan: explode -> distinct (doc, token) pairs (map-side combined)
    -> ONE groupBy token building df + sort_array(collect_list) in the
    same aggregate. At 100 TB the posting list of a mid-band token is
    thousands of ids — executor-resident per group; the df band is the
    knob that keeps it so (an unbanded index would put the full corpus
    id list under every stopword)."""
    toks = _tokens(text_col)
    if ngram > 1:
        # word n-grams as the index unit: JVM transform over the token
        # array (no UDF); n-grams spread a small whole-word vocabulary
        # across the df spectrum, which is what gives the band teeth
        unit = F.transform(
            F.sequence(F.lit(0), F.size(toks) - ngram),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(ngram)]
            ),
        )
        unit = F.when(F.size(toks) >= ngram, unit).otherwise(
            F.array().cast("array<string>")
        )
    else:
        unit = toks
    pairs = (
        df.select(F.col(id_col), F.explode(unit).alias("token"))
        .distinct()
    )
    agg = pairs.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.array_join(
            F.sort_array(F.collect_list(F.lpad(F.col(id_col).cast("string"), 12, "0"))),
            ",",
        ).alias("postings"),
    )
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    return agg.where(cond)


def token_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_docs: int = 5,
    k: int = 30,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k token collocations by pointwise mutual information over
    document co-occurrence: PMI(a,b) = ln(N * df_ab / (df_a * df_b))
    with document frequencies as the probability estimates — the
    phrase-mining / stopword-structure readout of a corpus (high PMI =
    tokens that appear together far more than chance).

    Scale shape: the corpus reduces to DISTINCT (doc, token) pairs
    map-side; the pair join is a self-equi-join on doc_id whose fan-out
    is per-doc-distinct-vocabulary squared — bounded by document length,
    NOT corpus size (the a < b ordering halves it). df relations are
    token-cardinality-sized and broadcast. min_pair_docs prunes the
    noise tail before ranking; ties break lexicographically."""
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    pairs = (
        df.select(F.col(id_col).alias("_d"), F.explode(_tokens(text_col)).alias("t"))
        .distinct()
    )
    n_docs = df.select(F.count("*").cast("long").alias("nd"))
    dfs = pairs.groupBy("t").agg(F.count("*").cast("long").alias("df1"))
    co = (
        pairs.alias("x")
        .join(pairs.alias("y"), "_d")
        .where(F.col("x.t") < F.col("y.t"))
        .groupBy(F.col("x.t").alias("a"), F.col("y.t").alias("b"))
        .agg(F.count("*").cast("long").alias("df_ab"))
        .where(F.col("df_ab") >= min_pair_docs)
    )
    scored = (
        co.join(broadcast(dfs.select(F.col("t").alias("a"),
                                     F.col("df1").alias("df_a"))), "a")
        .join(broadcast(dfs.select(F.col("t").alias("b"),
                                   F.col("df1").alias("df_b"))), "b")
        .crossJoin(broadcast(n_docs))
        .select(
            "a", "b", "df_ab", "df_a", "df_b",
            F.round(
                F.log(F.col("nd").cast("double") * F.col("df_ab")
                      / (F.col("df_a") * F.col("df_b")))
                + F.lit(1e-9), round_digits,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.col("pmi").desc(), F.col("a"), F.col("b")).limit(k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("a"), F.col("b"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "a", "b", "df_ab", "df_a", "df_b", "pmi"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 400,
    stride: int = 300,
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/context-window
    preprocessing step every embedding or RAG pipeline runs before
    indexing: character windows of `window` chars every `stride` chars
    (so consecutive chunks overlap by window - stride), the final
    chunk keeping whatever tail remains. Chunk starts are
    0, stride, 2·stride, … up to the last start < length, so every
    character lands in at least one chunk and short documents yield
    exactly one.

    Pure map-only JVM explode — sequence() builds the start offsets,
    substring() cuts the windows; no shuffle, no Python, output size
    ≈ input × window/stride regardless of SF. NULL/empty documents
    emit nothing. Returns (doc_id, chunk_id, start_char, n_chars,
    chunk_text) with chunk_id 0-based.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    ln = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.floor((ln - 1) / stride).cast("int") * stride,
        F.lit(stride),
    )
    out = (
        df.where(F.col(text_col).isNotNull() & (ln > 0))
        .select(id_col, text_col, F.explode(starts).alias("start_char"))
        .select(
            id_col,
            (F.col("start_char") / stride).cast("long").alias("chunk_id"),
            F.col("start_char").cast("long").alias("start_char"),
            F.col(text_col).substr(
                F.col("start_char") + 1, F.lit(window)
            ).alias("chunk_text"),
        )
    )
    return out.select(
        id_col, "chunk_id", "start_char",
        F.length("chunk_text").cast("long").alias("n_chars"),
        "chunk_text",
    )


def chunk_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 200,
) -> DataFrame:
    """Chunk-granular boilerplate measure: cut every document into
    non-overlapping `block`-char chunks, hash them, and report per
    document how many of its chunks occur ≥2 times ANYWHERE in the
    corpus — the block-level analogue of `dedup_lines` that catches
    templated spans line splitting misses (the preprocessing signal
    RefinedWeb/CCNet act on before MinHash).

    Scale shape: chunking is map-only (`chunk_documents` with stride =
    window); the global hash-frequency relation is ONE partial-
    aggregable groupBy on the chunk hash (an aggregate, not a window —
    a hot boilerplate hash is absorbed map-side instead of
    concentrating its rows in one task); the join back is a
    co-partitioned equi-join on the same hash. Returns
    (doc_id, n_chunks, n_dup, dup_frac)."""
    chunks = chunk_documents(df, id_col, text_col,
                             window=block, stride=block) \
        .select(id_col, F.md5("chunk_text").alias("_h"))
    freq = chunks.groupBy("_h").agg(F.count("*").cast("long").alias("_f"))
    return (
        chunks.join(freq, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("_f") >= 2, 1).otherwise(0))
            .cast("long").alias("n_dup"),
        )
        .select(
            id_col, "n_chunks", "n_dup",
            F.round(F.col("n_dup") / F.col("n_chunks") + F.lit(1e-9), 6)
            .alias("dup_frac"),
        )
    )
