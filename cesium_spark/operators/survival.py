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

__all__ = ["interevent_survival", "gap_burstiness", "burstiness_finalize",
           "km_survival", "weibull_fit"]

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
    p1 = F.when(pair, g1)
    sums = gaps.groupBy(type_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(g1).alias("s1"),
        F.sum(g1 * g1).alias("s2"),
        F.sum(pair.cast("long")).cast("long").alias("np"),
        F.sum(p1).alias("sx"),
        F.sum(F.when(pair, g2)).alias("sy"),
        F.sum(p1 * p1).alias("sxx"),
        F.sum(F.when(pair, g2 * g2)).alias("syy"),
        F.sum(F.when(pair, g1 * g2)).alias("sxy"),
    )
    return burstiness_finalize(sums, type_col=type_col,
                               round_digits=round_digits)


def burstiness_finalize(
    sums: DataFrame,
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """(B, M) from raw sufficient sums (n, s1, s2, np, sx, sy, sxx,
    syy, sxy) per type. Shared by the batch operator and the streaming
    head's delta-sum readback, so both paths compute the identical
    formulas — the sufficient statistics are ADDITIVE, which is the
    whole reason the live head can emit per-batch deltas and still
    reproduce the batch answer exactly."""
    n, np_ = F.col("n"), F.col("np")
    mu = F.col("s1") / n
    var = F.col("s2") / n - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    # NULL divisor when no pairs exist: under ANSI arithmetic a literal
    # np = 0 division is fatal even inside a never-taken WHEN branch
    # (common-subexpression hoisting evaluates it eagerly); x / NULL is
    # NULL and the memory WHEN already rejects np < 2
    npd = F.when(np_ > 0, np_)
    cov = F.col("sxy") / npd - (F.col("sx") / npd) * (F.col("sy") / npd)
    vx = F.col("sxx") / npd - (F.col("sx") / npd) * (F.col("sx") / npd)
    vy = F.col("syy") / npd - (F.col("sy") / npd) * (F.col("sy") / npd)
    return sums.select(
        type_col,
        n.alias("n_gaps"),
        F.round(mu + F.lit(_EPS), round_digits).alias("mean_gap_s"),
        F.round(sd + F.lit(_EPS), round_digits).alias("sd_gap_s"),
        F.round(
            F.when(sd + mu > 0, (sd - mu) / (sd + mu)) + F.lit(_EPS),
            round_digits,
        ).alias("burstiness"),
        np_.alias("n_pairs"),
        F.round(
            F.when(
                (np_ >= 2) & (vx > 0) & (vy > 0),
                cov / F.sqrt(vx * vy),
            )
            + F.lit(_EPS),
            round_digits,
        ).alias("memory"),
    )


def _km_steps(df, h_max, key_col, ts_col, type_col, tiebreak_col):
    """Shared KM machinery: (stepped, totals) where stepped holds the
    (type, dur_s, d, n_total, s_at) step curve up to h_max seconds and
    totals the per-type duration counts. See km_survival for the
    discretization and censoring conventions; the curve relation is
    (types x h_max)-bounded."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    us = ts_micros(F.col(ts_col))
    t_end = df.select(F.max(ts_micros(F.col(ts_col))).alias("m"))
    durs = (
        df.select(F.col(type_col), us.alias("us"),
                  F.lead(us).over(w).alias("nxt"))
        .crossJoin(F.broadcast(t_end))
        .select(
            type_col,
            F.ceil(
                F.coalesce(F.col("nxt") - F.col("us"),
                           F.col("m") - F.col("us"))
                / F.lit(1_000_000.0)
            ).cast("long").alias("dur_s"),
            F.col("nxt").isNotNull().cast("long").alias("is_event"),
        )
    )
    # ONE scan: beyond-horizon durations collapse into an overflow
    # bucket (h_max + 1) so per-type totals derive from the bounded
    # bucket relation instead of a second stream aggregation (the
    # interevent_survival single-pass discipline); the overflow bucket
    # never enters the risk-set window (every t_i <= h_max < bucket).
    buckets = (
        durs.groupBy(
            type_col,
            F.least(F.col("dur_s"), F.lit(int(h_max) + 1)).alias("dur_s"),
        )
        .agg(
            F.sum("is_event").cast("long").alias("d"),
            F.count("*").cast("long").alias("dropped"),
        )
    )
    # totals and grid both consume buckets: localCheckpoint the tiny
    # bounded relation so the stream scan + lag window run ONCE (lazy:
    # materializes inside the consuming job; the dedup clusters use the
    # same lineage-truncation idiom)
    buckets = buckets.localCheckpoint(eager=False)
    totals = buckets.groupBy(type_col).agg(
        F.sum("dropped").cast("long").alias("n_total")
    )
    grid = buckets.where(F.col("dur_s") <= h_max)
    wt = Window.partitionBy(type_col).orderBy("dur_s")
    prior = F.coalesce(
        F.sum("dropped").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    curve = (
        grid.join(F.broadcast(totals), type_col)
        .select(
            type_col, "dur_s", "d",
            (F.col("n_total") - prior).alias("n_risk"),
            "n_total",
        )
        .where(F.col("d") > 0)  # censoring-only times don't step S(t)
        .select(
            type_col, "dur_s", "d", "n_total",
            F.log(1.0 - F.col("d") / F.col("n_risk")).alias("lnf"),
        )
    )
    ws = Window.partitionBy(type_col).orderBy("dur_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = curve.select(
        type_col, "dur_s", "d", "n_total",
        F.exp(F.sum("lnf").over(ws)).alias("s_at"),
    )
    return stepped, totals


def km_survival(
    df: DataFrame,
    horizons_s: tuple[int, ...] = (60, 300, 900, 3600),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival of the wait to the actor's next event per
    opening type, with the right-censored final waits entering the risk
    set properly (Kaplan & Meier 1958) — unlike interevent_survival's
    empirical curve, which can only COUNT censored waits, KM uses them:
    a censored wait says "survived at least this long", so dropping it
    biases S(t) downward.

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    over event times t_i, with d_i events and n_i at-risk (duration >=
    t_i, observed or censored; the censored-last convention: a wait
    censored AT t_i is still at risk at t_i). Censoring is
    administrative: each actor's final wait is censored at the table's
    max timestamp.

    Scale shape: durations discretize to CEIL SECONDS and event times
    are kept only up to max(horizons) — so the windowed relation is
    (types x max_horizon_s)-bounded regardless of stream size; at-risk
    counts come from each type's total minus the cumulative drop-out,
    never from re-scanning. One lead window (shared actor-key shuffle)
    + one bounded groupBy + one bounded window.

    Returns (event_type, horizon_s, n_total, n_events_used, km_s) —
    km_s NULL when no event time falls at or below the horizon (S = 1
    there; NULL distinguishes "no information" from a measured 1.0,
    and the oracle replays the same rule).
    """
    if not horizons_s:
        raise ValueError("horizons_s must be non-empty")
    h_max = int(max(horizons_s))
    stepped, totals = _km_steps(
        df, h_max, key_col=key_col, ts_col=ts_col, type_col=type_col,
        tiebreak_col=tiebreak_col,
    )
    horizons = F.explode(
        F.array(*[F.lit(int(h)).cast("long") for h in horizons_s])
    ).alias("horizon_s")
    hdim = df.sparkSession.range(1).select(horizons)
    # S at horizon h = the step value at the LAST event time <= h
    return (
        stepped.join(F.broadcast(hdim), F.col("dur_s") <= F.col("horizon_s"))
        .groupBy(type_col, "horizon_s")
        .agg(
            F.any_value("n_total").alias("n_total"),
            F.sum("d").cast("long").alias("n_events_used"),
            F.round(
                F.min(F.struct((-F.col("dur_s")).alias("k"),
                               F.col("s_at").alias("v"))).v + F.lit(_EPS),
                round_digits,
            ).alias("km_s"),
        )
        .join(
            F.broadcast(
                totals.crossJoin(F.broadcast(hdim)).select(
                    type_col, "horizon_s", F.col("n_total").alias("_nt")
                )
            ),
            [type_col, "horizon_s"],
            "right",
        )
        .select(
            type_col, "horizon_s",
            F.col("_nt").alias("n_total"),
            F.coalesce("n_events_used", F.lit(0)).cast("long")
            .alias("n_events_used"),
            "km_s",
        )
    )


def weibull_fit(
    df: DataFrame,
    h_max: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Weibull fit of the wait-to-next-event distribution per opening
    type via the probability-plot regression on the KM curve (the
    standard reliability recipe: under Weibull(k, lambda),
    ln(-ln S(t)) is linear in ln t with slope k and intercept
    -k ln lambda). Shape k is the engine's hazard diagnostic:
    k < 1 = cooling (the longer silent, the likelier to stay silent —
    retry storms then abandonment), k = 1 = memoryless Poisson,
    k > 1 = aging (a response becomes MORE imminent as the wait grows).

    OLS runs from raw sums over the (types x h_max)-bounded KM step
    grid (points with 0 < S < 1 and t >= 1 s), so the fit is exactly
    replayable in SQL and adds nothing stream-sized.

    Returns (event_type, n_points, k_shape, lambda_s, r2).
    """
    stepped, _ = _km_steps(
        df, int(h_max), key_col=key_col, ts_col=ts_col, type_col=type_col,
        tiebreak_col=tiebreak_col,
    )
    pts = stepped.where(
        (F.col("s_at") > 0) & (F.col("s_at") < 1) & (F.col("dur_s") >= 1)
    ).select(
        type_col,
        F.log(F.col("dur_s").cast("double")).alias("x"),
        F.log(-F.log("s_at")).alias("y"),
    )
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, syy = F.sum(F.col("x") * F.col("x")), F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    vx = sxx / n - (sx / n) * (sx / n)
    vy = syy / n - (sy / n) * (sy / n)
    cov = sxy / n - (sx / n) * (sy / n)
    k = cov / vx
    b = sy / n - k * (sx / n)
    return (
        pts.groupBy(type_col)
        .agg(
            n.cast("long").alias("n_points"),
            F.round(
                F.when((n >= 3) & (vx > 0), k) + F.lit(_EPS), round_digits
            ).alias("k_shape"),
            F.round(
                F.when((n >= 3) & (vx > 0), F.exp(-b / k)) + F.lit(_EPS),
                round_digits,
            ).alias("lambda_s"),
            F.round(
                F.when((n >= 3) & (vx > 0) & (vy > 0), cov * cov / (vx * vy))
                + F.lit(_EPS),
                round_digits,
            ).alias("r2"),
        )
    )
