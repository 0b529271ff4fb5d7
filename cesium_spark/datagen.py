"""Deterministic synthetic transcript generator (FIXTURES.md §F1).

Schema (BASELINE.json input_hint):
  (conv_id string, turn_idx int, role string, text string, tool string,
   ts timestamp)

Properties exercised:
  - Zipf-distributed conversation sizes (hot-conversation skew),
  - three cadence regimes per conversation (regular grid / irregular
    uniform gaps / bursty with multi-hour-to-day gaps) so all three
    retention tiers (1m/1h/1d) are non-trivial,
  - duplicate timestamps within a conversation (tie broken by turn_idx),
  - rows emitted out of time order (the engine must sort),
  - text deterministic per (conv_id, turn_idx), length 1..2000 — length is
    the measurement channel m.

Generation is fully distributed: ``spark.range(n_convs)`` fans out and each
conversation is synthesized on-executor from RandomState(seed + conv_index)
— no driver-side materialization, so the same code generates the bench
table at any scale. Everything derives from the seed; no wall-clock reads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

EPOCH_START = np.datetime64("2025-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["", "search", "exec", "browse"])
_ALPHABET = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ., ", dtype=np.uint8)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _conv_rows(ci: int, seed: int, span_days: float, zipf_a: float, max_turns: int) -> pd.DataFrame:
    rng = np.random.RandomState((seed * 1_000_003 + ci) % (2**31 - 1))
    n = int(min(max_turns, 5 + rng.zipf(zipf_a)))
    regime = ci % 3
    span_s = span_days * 86400.0
    start = rng.uniform(0, span_s * 0.1)
    if regime == 0:  # regular grid, 60 s cadence
        t = start + 60.0 * np.arange(n)
    elif regime == 1:  # irregular: sorted uniform over a sub-span
        t = np.sort(rng.uniform(start, start + min(span_s, n * 600.0), n))
        # inject duplicate timestamps (tie broken by turn_idx downstream)
        if n >= 10:
            dup = np.arange(9, n, 50)
            t[dup] = t[dup - 1]
    else:  # bursty: short gaps with occasional multi-hour/day jumps
        gaps = rng.exponential(30.0, n)
        jumps = rng.rand(n) < 0.02
        gaps[jumps] += rng.uniform(3600.0, 2.0 * 86400.0, int(jumps.sum()))
        t = start + np.cumsum(gaps)
    t = np.minimum(t, span_s - 1.0)

    turn_idx = np.arange(n, dtype=np.int32)
    lengths = 1 + (rng.rand(n) * 1999).astype(np.int64)
    # deterministic text: one vectorized draw for the whole conversation,
    # sliced per turn (fast path — one RandomState per conversation)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    blob = _ALPHABET[rng.randint(0, len(_ALPHABET), offs[-1])].tobytes().decode("ascii")
    texts = [blob[offs[i]: offs[i + 1]] for i in range(n)]

    pdf = pd.DataFrame(
        {
            "conv_id": np.repeat(f"conv-{ci}", n),
            "turn_idx": turn_idx,
            "role": ROLES[turn_idx % 3],
            "text": texts,
            "tool": TOOLS[(turn_idx * 7 + ci) % 4],
            "ts": EPOCH_START + (t * 1e6).astype("timedelta64[us]"),
        }
    )
    # emit out of order on disk: deterministic shuffle
    perm = rng.permutation(n)
    return pdf.iloc[perm].reset_index(drop=True)


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    span_days: float = 7.0,
    zipf_a: float = 1.2,
    max_turns: int = 100_000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript table; same (seed, n_convs,
    span_days) always yields byte-identical rows regardless of
    partitioning."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for ci in b["id"].to_numpy():
                yield _conv_rows(int(ci), seed, span_days, zipf_a, max_turns)

    rng = spark.range(n_convs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(_gen, schema=TRANSCRIPT_SCHEMA)
