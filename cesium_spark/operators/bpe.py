"""Distributed byte-pair-encoding vocabulary training (Sennrich,
Haddow, Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the BPE formulation GPT/Llama tokenizers descend
from).

Layout for a 100 TB corpus: the corpus is touched EXACTLY ONCE (the
word-frequency aggregation — one map-side-combined shuffle). Every
merge iteration then runs against the word-frequency relation, whose
size is the DISTINCT vocabulary (Zipf: ~10^6-10^7 rows even at corpus
scale), not the corpus:

- pair counting: explode adjacent symbol pairs weighted by word
  frequency -> one small hash aggregation -> TakeOrderedAndProject(1)
  for the argmax pair ((count desc, pair asc) — the deterministic
  tie-break);
- merge application: one vectorized Arrow pass over the vocab rows
  (greedy left-to-right non-overlapping, the reference semantics);
- ``localCheckpoint(eager=True)`` truncates lineage each round so the
  plan doesn't grow with merge count (blocks are ContextCleaner-
  reclaimed).

Driver state per merge: ONE collected row (the argmax pair). Classic
single-node trainers (fastBPE) incrementally update pair counts
instead of recounting; our recount is already corpus-independent, and
the incremental-delta variant drops in behind the same loop if the
vocabulary relation itself ever dominates.

Symbol alphabet: characters of the word plus a terminal '</w>' symbol
(the original end-of-word marker), so merges distinguish suffixes from
mid-word units. Caveat: the JVM-side character split is per UTF-16
code unit, so astral-plane characters (emoji etc.) start as surrogate
halves where the Python reference starts from code points — for
byte-fallback semantics on such corpora, pre-encode text to a
byte-level alphabet (GPT-2 style) before training; on BMP text the
two splits are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cesium_spark.operators.text import _tokens

__all__ = ["train_bpe", "bpe_reference", "bpe_encode", "word_frequencies"]

EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whole corpus — the single corpus-wide pass."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_word(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out, j, n = [], 0, len(syms)
    while j < n:
        if j + 1 < n and syms[j] == left and syms[j + 1] == right:
            out.append(left + right)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def train_bpe(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_freq: int = 2,
):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (merges, vocab_df) where merges is a list of (rank, left, right)
    and vocab_df the final (word, freq, syms) relation. Stops early
    when the best remaining pair occurs fewer than ``min_freq`` times
    (weighted by word frequency)."""
    import pandas as pd

    spark = df.sparkSession
    wc = word_frequencies(df, text_col)
    vocab = wc.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "k -> struct(syms[k-1] AS l, syms[k] AS r))"
    )
    merges: list = []
    for rank in range(n_merges):
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select("freq", F.explode(pair_expr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((rank, left, right))

        def apply_fn(syms_ser, _l=left, _r=right):
            return pd.Series(
                [_merge_word(list(s), _l, _r) for s in syms_ser]
            )

        apply_udf = F.pandas_udf(apply_fn, "array<string>")
        vocab = vocab.select(
            "word", "freq", apply_udf(F.col("syms")).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_reference(word_freqs: dict, n_merges: int = 20, min_freq: int = 2):
    """Independent single-node reference (the Sennrich et al. pseudo-
    code, reimplemented over a plain dict) for cross-checking the
    distributed trainer: identical alphabet, greedy merge, and
    (count desc, pair asc) tie-break."""
    vocab = {w: tuple(list(w) + [EOW]) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        left, right = best[0]
        merges.append((rank, left, right))
        vocab = {
            w: tuple(_merge_word(list(s), left, right))
            for w, s in vocab.items()
        }
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: whitespace pre-split,
    then each word replayed through the merges in rank order (one
    vectorized Arrow pass; per-word work is bounded by word length x
    applicable merges)."""
    import pandas as pd

    ordered = [(l, r) for _, l, r in sorted(merges)]

    def enc_fn(texts):
        import re

        # mirror the training tokenization (_tokens: JVM lower + ASCII
        # \s+ split, empties dropped) — Python str.split()'s Unicode
        # whitespace would segment some corpora differently from the
        # vocabulary the merges were learned on. (Exotic caveat: locale
        # case mappings like Turkish dotted-İ can still lower()
        # differently between Python and the JVM.)
        ws = re.compile(r"\s+", re.ASCII)
        out = []
        cache: dict = {}
        for t in texts:
            toks: list = []
            for w in (w for w in ws.split((t or "").lower()) if w):
                if w not in cache:
                    syms = list(w) + [EOW]
                    for l, r in ordered:
                        if len(syms) < 2:
                            break
                        syms = _merge_word(syms, l, r)
                    cache[w] = syms
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    from .fanout import fan_out

    enc_udf = F.pandas_udf(enc_fn, "array<string>")
    # the per-word merge loop is the whole cost and sits before any
    # exchange: fan out single-split scans (no-op on well-split tables)
    return fan_out(df).withColumn(out_col, enc_udf(F.col(text_col)))
