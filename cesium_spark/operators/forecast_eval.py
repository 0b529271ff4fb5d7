"""Forecaster tournament on a held-out tail: fit every forecaster the
engine exposes on the HEAD of each series' zero-filled hourly grid,
score one-shot multi-step forecasts on the held-out TAIL, and emit the
per-series winner — the measured routing decision
(`intermittency_profile` and `seasonal_strength` are the a-priori
routers; this is the empirical one, the standard rolling-origin
evaluation collapsed to a single origin).

Contestants (all fit on head hours only):
  - persistence_mean: the head's mean hourly rate, constant ahead
  - seasonal_hod:     the head's hour-of-day profile (the grid is
                      dense by construction, so every HOD is observed
                      once the head spans ≥ 24 hours)
  - holt:             level + k·trend from the per-step-rounded Holt
                      fold (`tsstats.holt_linear` recursion)
  - croston:          the SBA-corrected demand rate from the per-step-
                      rounded Croston fold (`intermittent`), constant
                      ahead; NULL when the head has < 2 demands

Scale shape: ONE grid build; the head fits are either raw-sum
aggregates (mean, HOD) or JVM `aggregate` folds over per-key head
arrays (holt, croston — arrays bounded by time span); the tail join
is co-partitioned on the key (the HOD join adds the 24-row profile
per key). Winner = argmin of the ROUNDED MAEs with ties resolved in
the contestant order above — both engines replay the same choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["forecast_tournament"]

_METHODS = ("persistence_mean", "seasonal_hod", "holt", "croston")


def _r6(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def forecast_tournament(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    holdout_hours: int = 48,
    alpha: float = 0.5,
    beta: float = 0.3,
    croston_alpha: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """Returns (key, n_head, n_tail, mae_persistence, mae_hod,
    mae_holt, mae_croston, winner). Series whose grid is shorter than
    holdout_hours + 24 emit nothing (head must cover a full day)."""
    from .symbolic import hourly_count_grid

    a1, a0 = float(alpha), round(1.0 - alpha, 12)
    b1, b0 = float(beta), round(1.0 - beta, 12)
    c1, c0 = float(croston_alpha), round(1.0 - croston_alpha, 12)

    g = hourly_count_grid(df, key_col, ts_col)
    nk = g.groupBy("_k").agg((F.max("_i") + 1).alias("_n"))
    g = g.join(nk, "_k").where(F.col("_n") >= holdout_hours + 24) \
        .withColumn("_c", F.col("_n") - holdout_hours)
    head = g.where(F.col("_i") < F.col("_c"))
    tail = g.where(F.col("_i") >= F.col("_c"))

    # --- persistence mean + hour-of-day profile (raw-sum fits) ---
    mean_fit = head.groupBy("_k").agg(
        (F.sum("_y") / F.count("*")).alias("_rate"),
        F.count("*").cast("long").alias("n_head"),
    )
    hod_fit = head.groupBy("_k", F.hour("_h").alias("_hod")).agg(
        (F.sum("_y") / F.count("*")).alias("_hod_rate"))

    # --- Holt fold on the head array (the holt_linear recursion) ---
    ser = head.groupBy("_k").agg(F.transform(
        F.array_sort(F.collect_list(F.struct("_i", "_y"))),
        lambda s: s["_y"],
    ).alias("_ys"))

    def holt_step(acc, y):
        pred = acc["l"] + acc["b"]
        l2 = F.round(F.lit(a1) * y + F.lit(a0) * pred + F.lit(1e-9),
                     round_digits)
        bb = F.round(F.lit(b1) * (l2 - acc["l"]) + F.lit(b0) * acc["b"]
                     + F.lit(1e-9), round_digits)
        return F.struct(l2.alias("l"), bb.alias("b"))

    holt_init = F.struct(
        F.element_at("_ys", 2).alias("l"),
        (F.element_at("_ys", 2) - F.element_at("_ys", 1)).alias("b"),
    )
    holt_st = F.aggregate(
        F.slice("_ys", 3, F.size("_ys") - 2), holt_init, holt_step)
    holt_fit = ser.select(
        "_k", holt_st["l"].alias("_hl"), holt_st["b"].alias("_hb"))

    # --- Croston fold on the head demand subsequence ---
    wd = Window.partitionBy("_k").orderBy("_i")
    dmd = (
        head.where(F.col("_y") > 0)
        .select("_k", F.row_number().over(wd).alias("_pos"),
                (F.col("_i") - F.lag("_i", 1).over(wd)).cast("double")
                .alias("_q"),
                F.col("_y").alias("_s"))
    )
    cro_ser = (
        dmd.where(F.col("_pos") >= 2)
        .groupBy("_k")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_q", "_s"))),
            lambda r: F.struct(r["_q"].alias("q"), r["_s"].alias("s")),
        ).alias("_dd"))
        .join(dmd.where(F.col("_pos") == 1)
              .select("_k", F.col("_s").alias("_s1")), "_k")
    )

    def cro_step(acc, e):
        z2 = F.round(F.lit(c1) * e["s"] + F.lit(c0) * acc["z"]
                     + F.lit(1e-9), round_digits)
        p2 = F.round(F.lit(c1) * e["q"] + F.lit(c0) * acc["p"]
                     + F.lit(1e-9), round_digits)
        return F.struct(z2.alias("z"), p2.alias("p"))

    cro_init = F.struct(
        F.col("_s1").alias("z"), F.element_at("_dd", 1)["q"].alias("p"))
    cro_st = F.aggregate(
        F.slice("_dd", 2, F.greatest(F.size("_dd") - 1, F.lit(0))),
        cro_init, cro_step)
    cro_fit = cro_ser.select(
        "_k",
        (F.lit(1.0 - croston_alpha / 2.0) * cro_st["z"] / cro_st["p"])
        .alias("_cro_rate"))

    # --- score the tail ---
    scored = (
        tail.select("_k", "_i", "_c", "_y", F.hour("_h").alias("_hod"))
        .join(mean_fit, "_k")
        .join(hod_fit, ["_k", "_hod"])
        .join(F.broadcast(holt_fit), "_k")
        .join(F.broadcast(cro_fit), "_k", "left")
        .select(
            "_k", "_y", "n_head",
            F.abs(F.col("_y") - F.col("_rate")).alias("_e_mean"),
            F.abs(F.col("_y") - F.col("_hod_rate")).alias("_e_hod"),
            F.abs(F.col("_y") - (F.col("_hl")
                  + (F.col("_i") - (F.col("_c") - 1)) * F.col("_hb"))
                  ).alias("_e_holt"),
            F.abs(F.col("_y") - F.col("_cro_rate")).alias("_e_cro"),
        )
    )
    per = scored.groupBy(F.col("_k").alias(key_col)).agg(
        F.first("n_head").alias("n_head"),
        F.count("*").cast("long").alias("n_tail"),
        _r6(F.avg("_e_mean"), round_digits).alias("mae_persistence"),
        _r6(F.avg("_e_hod"), round_digits).alias("mae_hod"),
        _r6(F.avg("_e_holt"), round_digits).alias("mae_holt"),
        _r6(F.avg("_e_cro"), round_digits).alias("mae_croston"),
    )
    maes = [F.col("mae_persistence"), F.col("mae_hod"),
            F.col("mae_holt"), F.col("mae_croston")]
    best = F.least(*maes)
    winner = (
        F.when(F.col("mae_persistence") == best, _METHODS[0])
        .when(F.col("mae_hod") == best, _METHODS[1])
        .when(F.col("mae_holt") == best, _METHODS[2])
        .otherwise(_METHODS[3])
    )
    return per.select(
        key_col, "n_head", "n_tail", "mae_persistence", "mae_hod",
        "mae_holt", "mae_croston", winner.alias("winner"),
    )
