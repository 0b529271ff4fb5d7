"""Inter-event survival analysis: the empirical survival function of
"time until the actor's next event", attributed to the type of the
event that opened the wait.

The product/ops question this answers for a transcript fleet: after an
`error` event, what fraction of actors are still silent one minute /
five minutes / an hour later? (Slow recovery after errors = stuck
agents; compare curves across types to rank which actions stall the
pipeline.) It is the Kaplan-Meier empirical curve in the un-censored
case — every gap here is fully observed because only events WITH a
successor contribute; each actor's final wait is right-censored and is
reported separately as ``n_censored`` rather than being silently
dropped.

Physical shape: one lag/lead window on the actor key (shared shuffle),
integer-microsecond gap arithmetic (no float time math), then a
crossJoin against the HORIZONS dim — a handful of literal rows, so
Catalyst broadcasts it and the tall side never reshuffles; the final
groupBy is (type x horizons)-bounded and partial-aggregates map-side.
Every step is ANSI-SQL-identical for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel import ts_micros

__all__ = ["interevent_survival", "gap_burstiness"]

_EPS = 1e-9


def interevent_survival(
    df: DataFrame,
    horizons_s: tuple[int, ...] = (60, 300, 900, 3600),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per (event_type, horizon) empirical survival of the wait to the
    actor's next event: ``s_frac = P(gap > horizon)`` over all fully
    observed gaps opened by that type, plus the gap count, the
    surviving count, the mean gap in seconds, and the per-type count
    of right-censored waits (last event of each actor).

    Returns (event_type, horizon_s, n_gaps, n_censored, n_surviving,
    s_frac, mean_gap_s) ordered by the caller.
    """
    if not horizons_s:
        raise ValueError("horizons_s must be non-empty")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gaps = df.select(
        F.col(type_col),
        (F.lead(ts_micros(F.col(ts_col))).over(w) - ts_micros(F.col(ts_col))).alias(
            "gap_us"
        ),
    )
    # long horizons: the microsecond product below overflows int32 at
    # h >= 2148 s under ANSI arithmetic, and the oracle emits BIGINT
    horizons = F.explode(
        F.array(*[F.lit(int(h)).cast("long") for h in horizons_s])
    ).alias("horizon_s")
    # NULL gaps (each actor's right-censored final wait) ride THROUGH the
    # crossJoin and are counted inside the same (type, horizon) aggregate
    # — a separate censored branch would re-run the scan + lag window a
    # second time over the whole stream (observed: 4 Exchanges / 2 scans
    # vs 2 Exchanges / 1 scan in this form); the duplicate per-horizon
    # censored rows collapse in the bounded aggregate.
    tall = gaps.crossJoin(F.broadcast(gaps.sparkSession.range(1).select(horizons)))
    observed = F.col("gap_us").isNotNull()
    n_gaps = F.sum(observed.cast("long"))
    surviving = F.sum(
        (
            observed
            & (F.col("gap_us") > F.col("horizon_s") * F.lit(1_000_000))
        ).cast("long")
    )
    return (
        tall.groupBy(type_col, "horizon_s")
        .agg(
            n_gaps.cast("long").alias("n_gaps"),
            F.sum((~observed).cast("long")).cast("long").alias("n_censored"),
            surviving.cast("long").alias("n_surviving"),
            F.round(surviving / n_gaps + F.lit(_EPS), round_digits).alias("s_frac"),
            F.round(
                F.avg(F.col("gap_us")) / F.lit(1_000_000.0) + F.lit(_EPS),
                round_digits,
            ).alias("mean_gap_s"),
        )
        .where(F.col("n_gaps") > 0)
        .select(
            type_col, "horizon_s", "n_gaps", "n_censored", "n_surviving",
            "s_frac", "mean_gap_s",
        )
    )


def gap_burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Burstiness and memory of inter-event gaps per opening event type
    (Goh & Barabasi 2008, EPL 81:48002): B = (sigma - mu)/(sigma + mu)
    in [-1, 1] separates Poisson-like traffic (B ~ 0) from bursty
    machine-gun retries (B -> 1) and metronome heartbeats (B -> -1);
    M = Pearson r of consecutive (gap_i, gap_{i+1}) pairs catches
    long-short alternation that B alone cannot see. Together they place
    each event type on the burstiness-memory plane — the standard
    diagnostic for whether a feed is organic or synthetic.

    Physical shape: TWO leads fused in one actor-key window (single
    sort-shuffle), integer-microsecond gaps, then one (types)-bounded
    aggregate from raw sums — stream scanned once, nothing after the
    window is event-sized. Moments use the population form
    (cross-engine-stable raw-sum arithmetic).

    NULL rules: B is NULL when sigma + mu = 0 (all gaps zero); M is
    NULL when either side of the pair relation is constant or fewer
    than 2 pairs exist.

    Returns (event_type, n_gaps, mean_gap_s, sd_gap_s, burstiness,
    n_pairs, memory).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    us = ts_micros(F.col(ts_col))
    gaps = df.select(
        F.col(type_col),
        (F.lead(us, 1).over(w) - us).alias("g1"),
        (F.lead(us, 2).over(w) - F.lead(us, 1).over(w)).alias("g2"),
    ).where(F.col("g1").isNotNull())
    s = F.lit(1_000_000.0)
    g1 = F.col("g1") / s
    g2 = F.col("g2") / s
    pair = F.col("g2").isNotNull()
    n = F.count("*")
    mu = F.avg(g1)
    var = F.avg(g1 * g1) - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    np_ = F.sum(pair.cast("long"))
    p1 = F.when(pair, g1)
    sx, sy = F.sum(p1), F.sum(F.when(pair, g2))
    sxx, syy = F.sum(p1 * p1), F.sum(F.when(pair, g2 * g2))
    sxy = F.sum(F.when(pair, g1 * g2))
    cov = sxy / np_ - (sx / np_) * (sy / np_)
    vx = sxx / np_ - (sx / np_) * (sx / np_)
    vy = syy / np_ - (sy / np_) * (sy / np_)
    return gaps.groupBy(type_col).agg(
        n.cast("long").alias("n_gaps"),
        F.round(mu + F.lit(_EPS), round_digits).alias("mean_gap_s"),
        F.round(sd + F.lit(_EPS), round_digits).alias("sd_gap_s"),
        F.round(
            F.when(sd + mu > 0, (sd - mu) / (sd + mu)) + F.lit(_EPS),
            round_digits,
        ).alias("burstiness"),
        np_.cast("long").alias("n_pairs"),
        F.round(
            F.when(
                (np_ >= 2) & (vx > 0) & (vy > 0),
                cov / F.sqrt(vx * vy),
            )
            + F.lit(_EPS),
            round_digits,
        ).alias("memory"),
    )
