"""Markov-chain analytics over typed event streams: the stationary
distribution of the corpus transition matrix and per-actor sequence
surprisal (negative log-likelihood) under that matrix.

Why this belongs in a transcript engine: the first-order transition
matrix (tsstats.event_transitions) describes "normal" agent behaviour;
its stationary distribution is the long-run action mix the chain
converges to (the baseline for capacity planning and drift alarms),
and per-actor NLL under the corpus matrix is the classic sequence
anomaly score — an agent taking transitions the fleet never takes has
high bits-per-transition surprisal even when every individual event
type is common (which is exactly the case type_entropy misses).

Engine discipline (kmeans.py / pagerank.py precedent): the event
stream is scanned once, reducing to the |types|^2-bounded matrix
relation; the power iteration then runs a FIXED number of rounds with
per-round rounding + renormalisation so a DuckDB oracle replays the
recursion as chained CTEs bit-for-bit. The NLL join broadcasts the
matrix (|types|^2 rows) onto the per-(actor, from, to) count relation
— integer counts first, so the per-actor log sum runs over at most
|types|^2 terms, never per-event.

Scale shape at 100 TB: the matrix and the state vector live in
relations bounded by the type vocabulary (not the stream); the only
stream-sized work is the one lag window + groupBy both consumers
share, shuffling once on the actor key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .tsstats import event_transitions

__all__ = ["markov_stationary", "markov_nll", "markov_entropy_rate"]

_EPS = 1e-9


def markov_stationary(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    n_iter: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Stationary distribution of the first-order event-type chain by
    fixed-round power iteration:

        pi_{t+1}(s) = round( sum_f pi_t(f) * P(f, s) / Z , digits)

    with Z renormalising each round (states that appear only as
    transition TARGETS are terminal rows of the empirical matrix, so
    raw iteration leaks mass; renormalisation keeps pi a distribution
    without inventing teleport edges the data never took). pi_0 is
    uniform over observed states. NULL-typed events are excluded —
    SQL equi-joins cannot carry NULL keys, and a NULL "state" has no
    behavioural meaning.

    Returns (event_type, pi) — one row per observed state.
    """
    trans = event_transitions(
        df, key_col=key_col, ts_col=ts_col, type_col=type_col,
        tiebreak_col=tiebreak_col, round_digits=round_digits,
    ).where(F.col("from_type").isNotNull() & F.col("to_type").isNotNull())
    # The kmeans.py discipline: the STREAM is reduced distributed (one
    # lag + groupBy inside event_transitions); the iteration state is
    # |types|^2-bounded — an event-type vocabulary is small by
    # construction — so the matrix collects to the driver and the 10
    # rounds run as numpy ops instead of 10 Spark jobs with 10-deep
    # join lineage. Same recursion, same per-round rounding, so the
    # DuckDB chained-CTE oracle replays it exactly.
    rows = trans.select("from_type", "to_type", "prob").collect()
    states = sorted({r["from_type"] for r in rows} | {r["to_type"] for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    if n == 0:
        spark = df.sparkSession
        return spark.createDataFrame([], f"{type_col} string, pi double")
    import numpy as np

    P = np.zeros((n, n))
    for r in rows:
        P[idx[r["from_type"]], idx[r["to_type"]]] = r["prob"]
    # half-up rounding (floor(x*q + 0.5)/q) == Spark/DuckDB round() for
    # non-negative inputs; python round() is banker's and would drift
    q = 10.0 ** round_digits
    pi = np.full(n, np.floor((1.0 / n + _EPS) * q + 0.5) / q)
    for _ in range(n_iter):
        raw = pi @ P
        pi = np.floor((raw / raw.sum() + _EPS) * q + 0.5) / q
    spark = df.sparkSession
    return spark.createDataFrame(
        [(s, float(pi[idx[s]])) for s in states],
        f"{type_col} string, pi double",
    )


def markov_entropy_rate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    n_iter: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Entropy rate of the first-order chain (Shannon 1948, eq. for
    Markov sources): H = sum_f pi(f) * H(.|f), with the conditional
    entropy H(.|f) = -sum_t P(f,t) log2 P(f,t). It is the bits/event
    floor any sequence model can reach on this stream — the number a
    trained next-action model's cross-entropy is judged against, and
    the honest denominator for "how predictable is the fleet".

    pi comes from the same fixed-round rounded power iteration as
    markov_stationary (oracle-replayable); H(.|f) is a |types|-bounded
    aggregate over the matrix relation; the total rides every row via a
    window over that bounded relation (NOT the stream).

    Returns (event_type, pi, h_cond_bits, contribution_bits,
    h_rate_bits) — one row per state, h_rate_bits repeated.
    """
    pi = markov_stationary(
        df, key_col=key_col, ts_col=ts_col, type_col=type_col,
        tiebreak_col=tiebreak_col, n_iter=n_iter, round_digits=round_digits,
    )
    trans = event_transitions(
        df, key_col=key_col, ts_col=ts_col, type_col=type_col,
        tiebreak_col=tiebreak_col, round_digits=round_digits,
    ).where(F.col("from_type").isNotNull() & F.col("to_type").isNotNull())
    h_cond = (
        trans.groupBy("from_type")
        .agg(
            F.round(
                F.sum(-F.col("prob") * F.log2("prob")) + F.lit(_EPS),
                round_digits,
            ).alias("h_cond_bits")
        )
    )
    # terminal states (appear only as targets) have no outgoing row:
    # H(.|f) = 0 by convention (the chain emits nothing from them)
    joined = pi.join(
        F.broadcast(h_cond),
        pi[type_col] == h_cond["from_type"],
        "left",
    ).select(
        pi[type_col],
        "pi",
        F.coalesce("h_cond_bits", F.lit(0.0)).alias("h_cond_bits"),
        F.round(
            F.col("pi") * F.coalesce("h_cond_bits", F.lit(0.0)) + F.lit(_EPS),
            round_digits,
        ).alias("contribution_bits"),
    )
    total = Window.partitionBy()  # |types|-row relation — bounded
    return joined.select(
        type_col, "pi", "h_cond_bits", "contribution_bits",
        F.round(
            F.sum("contribution_bits").over(total) + F.lit(_EPS), round_digits
        ).alias("h_rate_bits"),
    )


def markov_nll(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-actor sequence surprisal under the corpus transition matrix:
    mean bits per transition

        nll_bits = - sum_{(f,t)} n_ft * log2 P(f | t) / n_transitions

    plus ``max_surprise_bits`` (the single most improbable transition
    the actor took) and its (from, to) pair. P comes from the SAME
    stream (empirical matrix), so every observed pair has P > 0 and no
    smoothing is needed; scoring a second stream against a frozen
    matrix is the same join with ``matrix`` built elsewhere.

    Physical shape: per-(actor, from, to) integer counts first (one
    lag window + one groupBy, sharing the actor-key shuffle), then the
    |types|^2 matrix broadcasts onto that bounded relation; the log
    runs over matrix-sized terms per actor, never per event. Ties on
    max_surprise resolve to the lexicographically smallest (from, to)
    pair so both engines pick the same row.

    Returns (key, n_transitions, nll_bits, max_surprise_bits,
    surprise_from, surprise_to).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.where(F.col(type_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(type_col).alias("to_type"),
            F.lag(F.col(type_col)).over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy(key_col, "from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n_ft"))
        # the corpus matrix below is the per-actor relation re-summed,
        # so one materialization serves both (r7: previously the event
        # stream was scanned + lag-windowed twice — once here, once
        # inside event_transitions)
        .localCheckpoint(eager=False)
    )
    # corpus transition matrix derived FROM the per-actor counts: with
    # type non-null (filtered above), event_transitions' pair relation
    # is exactly sum_actors(n_ft) per (from, to) — same counts, same
    # window-conditional probability, same rounding (_r6 at
    # round_digits), so prob is value-identical to calling it on df
    tot = Window.partitionBy("from_type")
    mat = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.sum("n_ft").cast("long").alias("n"))
        .select(
            "from_type", "to_type",
            F.round(F.col("n") / F.sum("n").over(tot) + F.lit(_EPS),
                    round_digits).alias("prob"),
        )
    )
    bits = -F.log2(F.col("prob"))
    scored = pairs.join(F.broadcast(mat), ["from_type", "to_type"])
    # argmax via min(struct(-bits, from, to)): -bits ascending == bits
    # descending, and on a bits tie min picks the lexicographically
    # SMALLEST pair — deterministic across engines and partitionings.
    # bits is rounded BEFORE the argmax so a sub-rounding tie cannot
    # order-drift between Spark and the oracle.
    rbits = F.round(bits + F.lit(_EPS), round_digits)
    pick = F.min(
        F.struct(
            (-rbits).alias("nb"),
            F.col("from_type").alias("f"),
            F.col("to_type").alias("t"),
        )
    ).alias("_pick")
    n_trans = F.sum("n_ft")
    return (
        scored.groupBy(key_col)
        .agg(
            n_trans.cast("long").alias("n_transitions"),
            F.round(
                F.sum(F.col("n_ft") * bits) / n_trans + F.lit(_EPS), round_digits
            ).alias("nll_bits"),
            pick,
        )
        .select(
            key_col,
            "n_transitions",
            "nll_bits",
            (-F.col("_pick.nb")).alias("max_surprise_bits"),
            F.col("_pick.f").alias("surprise_from"),
            F.col("_pick.t").alias("surprise_to"),
        )
    )
