"""Deduplication operators for large-scale training-data pipelines.

All of these are shuffle-conscious:
  - exact dedup: one hash-groupBy on a 128-bit digest (never on raw text —
    the shuffle carries 32 bytes/row, not documents);
  - n-gram Jaccard: shingle-explode -> equi-join on shingle -> pair count.
    The shingle join is the classic candidate generator; frequency-capped
    shingles (stop_df) keep hot shingles from quadratic blowup;
  - MinHash + LSH: signature via min(md5(seed || shingle)) per seed —
    md5 hex compares lexicographically, so min() over hex digests is a
    valid uniform min-hash, and (crucially) it is reproducible in ANY
    engine with an md5() function, which is how the DuckDB oracle checks
    us; band keys bucket-join candidates so the cross product never forms;
  - SimHash: 64-bit signature via vectorized pandas UDF (token hashes from
    blake2b, deterministic across runs/engines).

At 100 TB: every join here is on a short hash key; skew is bounded by the
shingle frequency cap; nothing collects to the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = [
    "exact_dedup_groups",
    "char_shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_pairs",
]


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: digest, group size, and the keeper
    (minimum id) — the survivor under exact dedup."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def char_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Distinct character k-grams per document: (id, shingle).

    Uses sequence+transform+explode — all JVM expressions, no Python.
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 0)),"
        f" i -> substring({text_col}, i, {k}))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) with char-k-gram Jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), exact (integer ratio).
    max_shingle_freq drops shingles appearing in more than that many docs
    (stopword-shingles produce quadratic candidates at scale).
    """
    sh = char_shingles(df, id_col, text_col, k)
    if max_shingle_freq is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_freq)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature columns mh_0..mh_{H-1}: mh_i = min over shingles
    of md5(i || '|' || shingle). Engine-portable by construction (md5 hex
    is lexicographic) — the DuckDB oracle recomputes it verbatim."""
    sh = char_shingles(df, id_col, text_col, k)
    # hash each DISTINCT shingle once (the shingle vocabulary is far
    # smaller than the (doc, shingle) relation), then join the small hash
    # dim back — identical results, ~vocab/corpus fewer md5 evaluations
    vocab = sh.select("shingle").distinct().select(
        "shingle",
        *[
            F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h_{i}")
            for i in range(num_hashes)
        ],
    )
    joined = sh.join(vocab.hint("broadcast"), "shingle")
    return joined.groupBy("id").agg(
        *[F.min(f"h_{i}").alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band digest.

    Bands of r = num_hashes/bands rows; band key = md5(concat of the
    band's minhashes). Join is on (band_idx, band_key) — candidates only,
    never a cross product. Returns distinct (id_a < id_b) pairs with the
    number of matching bands.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * r + i}") for i in range(r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("key")).alias(f"b{b}")
        )
    bands_df = sig.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    return (
        a.join(b_, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("matching_bands"))
    )


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text over whitespace tokens; token hash =
    first 8 bytes of blake2b (deterministic, salt-free)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").split():
            digest = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8)).astype(np.int64)
            acc += 2 * bits - 1
        sig = int(np.packbits(acc > 0).view(">u8")[0])
        out[row] = np.int64(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out)


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — vectorized Arrow-batched UDF, one pass, no shuffle."""
    udf = F.pandas_udf(_simhash_batch, LongType())
    return df.select(F.col(id_col).alias("id"), udf(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via the
    pigeonhole block trick: split 64 bits into `blocks` chunks; any pair
    within distance < blocks shares at least one exact chunk — join on
    (chunk_idx, chunk_value), verify distance with bit_count(xor)."""
    assert 64 % blocks == 0
    width = 64 // blocks
    sig = simhash64(df, id_col, text_col)
    chunk_cols = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            ).alias("val"),
        ).alias(f"c{i}")
        for i in range(blocks)
    ]
    chunks = sig.select("id", "simhash", F.explode(F.array(*chunk_cols)).alias("c")).select(
        "id", "simhash", F.col("c.blk").alias("blk"), F.col("c.val").alias("val")
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
