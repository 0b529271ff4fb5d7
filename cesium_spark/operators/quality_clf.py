"""Quality-classifier document scoring — the CCNet / GPT-3 recipe
(Wenzek et al. 2020 §4.3; Brown et al. 2020 appendix A): train a linear
classifier over hashed token features to separate a high-quality seed
set from the raw corpus, then score every document and keep the
high-probability head. Here the high-quality seed is the engine's own
`corpus_verdict` survivors (the clean_corpus composition), so the whole
loop — seed derivation, feature hashing, training, scoring — runs
engine-native and DuckDB-oracle-replayable, no external fastText/sklearn
dependency.

Model: logistic regression over D hashed token-frequency buckets plus an
intercept. Features are hashingTF-style: bucket(token) = int(md5
hex[:8]) % D (the engine-portable hash the md5 dataset split already
established), x_bucket = count/n_tokens. Training is ``iters`` rounds of
full-batch gradient descent on a deterministic md5-sampled subset:

    w <- round(w - lr * (1/n) X^T (sigmoid(Xw) - y) + 1e-9, 6)

Weights are ROUNDED to ``round_digits`` after every round in both
engines (the distributed-kmeans discipline: per-iteration rounding stops
cross-engine float drift from compounding), which is what lets the
DuckDB oracle replay the iterations as chained CTEs and match the final
probabilities hash-exactly.

Scale shape: the feature relation is built once (one tokenize/explode
shuffle, hot buckets pre-aggregated per doc) and lineage-truncated; each
GD round is two joins + two aggregations against it, with ONE
(D+1)-row collect per round — bounded driver state, like the k-means
centroid loop. The training subset is an md5-hash filter (map-only,
growth-stable — the same property as hash_split), so "bounded sample"
is a predicate pushed into the scan, not a driver-side sample().
Scoring is MAP-ONLY: score = (sum over tokens of w[bucket(token)]) /
n_tokens + w_intercept, evaluated as a higher-order aggregate over the
token array against the broadcast (rounded) weight map — no shuffle, no
join, inlines into whatever scan reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_token_features",
    "train_quality_classifier",
    "score_quality",
    "quality_classifier_scores",
]

_SAMPLE_BUCKETS = 10_000


def _bucket_expr(tok: Column, n_buckets: int) -> Column:
    """Engine-portable token hash bucket: int(md5(token)[:8], 16) % D —
    reproducible in DuckDB as ('0x' || substr(md5(t), 1, 8))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_token_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, bucket, x): token-frequency per hashed bucket, plus the
    always-on intercept pseudo-bucket ``n_buckets`` with x = 1.0 (so the
    bias trains/scores through the same dataflow as the weights)."""
    from .fanout import fan_out
    from .text import _tokens

    toks = fan_out(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), _tokens(text_col).alias("_toks")
    )
    exploded = toks.select(
        "id", F.size("_toks").alias("_n"), F.explode("_toks").alias("_tok")
    )
    freq = (
        exploded.select(
            "id", "_n", _bucket_expr(F.col("_tok"), n_buckets).alias("bucket")
        )
        .groupBy("id", "bucket")
        .agg((F.count("*") / F.first("_n")).alias("x"))
    )
    intercept = toks.select(
        "id", F.lit(n_buckets).alias("bucket"), F.lit(1.0).alias("x")
    )
    return freq.unionByName(intercept)


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    sample_frac: float | None = 0.5,
    sample_salt: str = "qclf",
    round_digits: int = 6,
) -> list[float]:
    """Learn the (D+1) rounded weights (index D = intercept). ``labels``
    is (id, y∈{0,1}); training runs on the deterministic md5-sampled
    subset (``sample_frac`` of ids, growth-stable) — None trains on all."""
    feats = hashed_token_features(docs, id_col, text_col, n_buckets)
    lab = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    if sample_frac is not None:
        cut = int(round(sample_frac * _SAMPLE_BUCKETS))
        key = F.concat(F.col("id").cast("string"), F.lit(sample_salt))
        keep = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % _SAMPLE_BUCKETS
            < cut
        )
        lab = lab.filter(keep)
    train = feats.join(lab, "id").localCheckpoint(eager=True)
    # n_train rides along lazily (1-row broadcast crossJoin — the lm.py
    # vocabulary pattern; an eager .count() would re-run the corpus scan)
    n_tr = train.select("id").distinct().agg(
        F.count("*").cast("double").alias("_n_train")
    )

    spark = docs.sparkSession
    w = [0.0] * (n_buckets + 1)
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(b, wb) for b, wb in enumerate(w)], "bucket int, w double"
        )
        scores = (
            train.join(F.broadcast(wdf), "bucket")
            .groupBy("id")
            .agg(
                F.sum(F.col("x") * F.col("w")).alias("s"),
                F.first("y").alias("y"),
            )
        )
        resid = scores.select(
            "id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y"))
            .alias("r"),
        )
        grad_rows = (
            train.select("id", "bucket", "x")
            .join(resid, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .crossJoin(F.broadcast(n_tr))
            .select("bucket", (F.col("g") / F.col("_n_train")).alias("g"))
            .collect()
        )
        grads = {row["bucket"]: row["g"] for row in grad_rows}
        w = [
            round(wb - lr * grads.get(b, 0.0) + 1e-9, round_digits)
            for b, wb in enumerate(w)
        ]
    return w


def score_quality(
    docs: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(id, quality_prob) — MAP-ONLY scoring against the broadcast
    rounded weight map (see module doc); weights[-1] is the intercept."""
    from .text import _tokens

    n_buckets = len(weights) - 1
    wmap = F.create_map(
        *[F.lit(v) for b in range(n_buckets) for v in (b, weights[b])]
    )
    toks = _tokens(text_col)
    tok_sum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(wmap, _bucket_expr(t, n_buckets).cast("int")),
    )
    n = F.size(toks)
    score = (
        F.when(n > 0, tok_sum / n).otherwise(F.lit(0.0))
        + F.lit(weights[n_buckets])
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return docs.select(
        F.col(id_col),
        F.round(prob + F.lit(1e-9), round_digits).alias("quality_prob"),
    )


def quality_classifier_scores(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **train_kwargs,
) -> DataFrame:
    """Train on the md5-sampled subset, score EVERY document — the
    composed stage a pipeline materializes."""
    w = train_quality_classifier(
        docs, labels, id_col=id_col, text_col=text_col, **train_kwargs
    )
    return score_quality(docs, w, id_col=id_col, text_col=text_col)
