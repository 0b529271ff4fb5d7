"""Multimodal column plumbing: image/audio/video payloads as opaque
binary columns with typed metadata, processed by Arrow-batched UDFs.

Decoding: WAV/PCM audio, uncompressed BMP, PNG, and baseline JPEG
decode FOR REAL via the pure-numpy codecs in operators/media_codecs.py
and operators/jpeg_codec.py (header parse + numpy; PNG rides stdlib
zlib; JPEG is a from-scratch T.81 Huffman+DCT incl. 4:2:0/4:2:2
chroma subsampling AND progressive SOF2 scans). The remaining
formats (MP3/H.264) require a codec
library that does not ship in this container: `register_decoder`
installs the real one in such a deployment, and until then those types
get deterministic digest-derived pseudo-features so the Spark-side
plumbing — schema, partitioning, UDF signatures, batch shapes — stays
real and tested end-to-end.

Design for 100 TB: payloads never leave the executor as Python objects;
mapInPandas streams Arrow batches, metadata-only operations (routing,
size stats, dedup by digest) are pure JVM expressions on the narrow
columns and never touch the blob.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "media_schema", "attach_media_metadata", "dedup_media_exact",
    "extract_features", "register_decoder",
    "resize_images", "sample_frames", "register_video_decoder",
]

MEDIA_FEATURE_DIM = 8

_DECODER: Callable[[bytes, str], np.ndarray] | None = None


def register_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real decoder: fn(payload_bytes, media_type) -> float32
    feature vector of length MEDIA_FEATURE_DIM."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for codec-requiring formats: 8 floats
    derived from the blake2b digest. Real deployments replace this via
    register_decoder (the container has no MP3/video codecs)."""
    d = hashlib.blake2b(payload or b"", digest_size=32).digest()
    u = np.frombuffer(d, dtype=np.uint32).astype(np.float64)
    return (u / np.float64(2**32)).astype(np.float32)


def _default_decode(payload: bytes, media_type: str) -> np.ndarray:
    """WAV/BMP/PNG/JPEG decode for real (pure numpy); digest pseudo-
    features for formats that need an external codec AND for corrupt payloads — one
    malformed blob in a 100 TB batch must degrade to pseudo-features,
    never fail the whole task (arbitrary bytes can raise struct.error
    and friends from deep inside the header parse, hence the broad
    except; the codecs validate and raise ValueError for the common
    corruptions, the rest is hostile-input noise)."""
    from .media_codecs import numpy_media_decoder

    try:
        return numpy_media_decoder(payload, media_type)
    except Exception:
        return _fake_decode(payload, media_type)


def media_schema() -> str:
    return (
        "media_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int"
    )


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-only metadata: byte size + content digest (for exact dedup and
    routing) without deserializing the payload in Python."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))) \
             .withColumn("digest", F.sha2(F.col(payload_col), 256))


def dedup_media_exact(df: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Exact payload dedup by digest: one hash-groupBy, blob never
    shuffled (only the 32-byte digest moves)."""
    return (
        df.select(F.sha2(F.col(payload_col), 256).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("group_size"), F.min(id_col).alias("keeper_id"))
    )


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """payload -> fixed-dim float feature vector via Arrow-batched
    mapInPandas (WAV/BMP/PNG decode for real; see module docstring)."""
    decoder = _DECODER or _default_decode
    out_schema = f"{id_col} long, features array<float>"

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, t).tolist()
                for p, t in zip(pdf[payload_col], pdf[type_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col, type_col).mapInPandas(_mapper, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """Decode (real pure-numpy codecs: BMP/PNG/JPEG) -> nearest-neighbor
    resize -> lossless PNG re-encode, Arrow-batched via mapInPandas.
    Undecodable payloads pass through UNCHANGED with resized=false —
    one hostile blob must never fail the batch. Output:
    (id, media_type, payload, width, height, resized); resized rows
    carry media_type='image/png'.

    100 TB shape: blobs stay inside the executor (Arrow batches), the
    output is written straight back out — no driver involvement, no
    shuffle (narrow map-only plan)."""
    from .media_codecs import decode_image, encode_png, resize_rgb

    out_schema = (
        f"{id_col} long, media_type string, payload binary, "
        "width int, height int, resized boolean"
    )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, t in zip(pdf[id_col], pdf[payload_col], pdf[type_col]):
                try:
                    img = resize_rgb(decode_image(bytes(p), t), width, height)
                    rows.append((mid, "image/png", bytearray(encode_png(img)),
                                 width, height, True))
                except Exception:
                    rows.append((mid, t, p, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "media_type", "payload", "width", "height",
                         "resized"],
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(_mapper, out_schema)


_VIDEO_DECODER: Callable[[bytes, list], list] | None = None


def register_video_decoder(fn: Callable[[bytes, list], list]) -> None:
    """Install a real video decoder: fn(payload, frame_indices) ->
    [(frame_idx, (h, w, 3) uint8 RGB), ...]. Until registered, only the
    BMP-sequence container decodes (media_codecs.decode_bmp_video);
    entropy-coded video (H.264/VP9) is skipped with sampled=false."""
    global _VIDEO_DECODER
    _VIDEO_DECODER = fn


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """Frame sampling for video columns: one OUTPUT ROW per sampled
    frame (id, frame_idx, media_type='image/png', payload) — frames
    0, every_n, 2*every_n, ... capped at max_frames, re-encoded as
    lossless PNG. The BMP-sequence container decodes for real (and only
    the REQUESTED frames are decoded — the sampler never materializes
    the whole clip); real video codecs plug in via
    register_video_decoder. Undecodable payloads emit a single row with
    frame_idx = -1 and a NULL payload so downstream joins can count
    skips without a second pass.

    100 TB shape: map-only (mapInPandas), no shuffle; the fan-out is
    bounded by max_frames per input row."""
    from .media_codecs import bmp_video_frame_count, decode_bmp_video, encode_png

    out_schema = (
        f"{id_col} long, frame_idx int, media_type string, payload binary"
    )

    def _decode(p: bytes, t: str):
        if _VIDEO_DECODER is not None:
            n_idx = [i * every_n for i in range(max_frames)]
            return _VIDEO_DECODER(p, n_idx)
        n = bmp_video_frame_count(p)  # raises for foreign containers
        idx = [i for i in range(0, n, every_n)][:max_frames]
        return decode_bmp_video(p, indices=idx)

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, t in zip(pdf[id_col], pdf[payload_col], pdf[type_col]):
                try:
                    for fi, img in _decode(bytes(p), t):
                        rows.append(
                            (mid, fi, "image/png", bytearray(encode_png(img)))
                        )
                except Exception:
                    rows.append((mid, -1, t, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "media_type", "payload"]
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(_mapper, out_schema)
