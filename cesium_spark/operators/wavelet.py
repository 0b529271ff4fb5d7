"""Haar multi-resolution energy decomposition over per-actor hourly
series.

The classic wavelet variance view of a time series: at dyadic level k
(block width 2^k grid steps), the detail coefficient of each block is
d = (mean(left half) - mean(right half)) / 2 * 2^(k/2) and the level's
energy is sum(d^2) — a scale-by-scale decomposition of variability
(Percival & Walden 2000, ch. 8's MODWT variance without the circular
wrap; a per-level view the ACF/periodogram diagnostics in tsstats
don't give: WHERE the variance lives across time scales).

Scale design: raw events collapse to the hourly mean grid first (one
partial-aggregable groupBy), positions come from one bounded window
(row_number per key over the grid), then a LEVELS-fold explode of the
grid feeds one (key, level, block) aggregate — total work is
levels x grid size, never levels x event volume. Half-means are
conditional aggregates in the same pass; no Python, no self-join.

Partial trailing blocks use present-value half-means; a block whose
right half has no data contributes zero detail (the boundary rule
that keeps energy additive as the series grows).

Cross-engine determinism: grid means and half-means are rounded
half-up at 6 decimals before differencing; the 2^(k/2) factor is the
same IEEE double in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["haar_energy"]

_EPS = 1e-9


def _r6(c: Column) -> Column:
    return F.round(c + F.lit(_EPS), 6)


def haar_energy(
    df: DataFrame,
    levels: int = 3,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key Haar detail energy at levels 1..levels.

    Returns (key..., level, n_blocks, energy): n_blocks counts the
    dyadic blocks the key's grid spans at that level, energy the sum
    of squared detail coefficients.
    """
    gcols = list(key_cols)
    grid = (
        df.groupBy(*gcols, F.date_trunc("hour", F.col(ts_col)).alias("h"))
        .agg(_r6(F.avg(F.col(value_col).cast("double"))).alias("x"))
    )
    w = Window.partitionBy(*gcols).orderBy("h")
    gi = grid.select(
        *gcols, "x", (F.row_number().over(w) - 1).cast("long").alias("idx")
    )
    lv = gi.select(
        *gcols, "x", "idx",
        F.explode(F.sequence(F.lit(1), F.lit(int(levels)))).alias("level"),
    )
    blk_w = F.pow(F.lit(2.0), F.col("level"))
    half_w = F.pow(F.lit(2.0), F.col("level") - 1)
    placed = lv.select(
        *gcols, "level", "x",
        F.floor(F.col("idx") / blk_w).cast("long").alias("block"),
        (F.floor(F.col("idx") / half_w).cast("long") % 2).alias("half"),
    )
    halves = placed.groupBy(*gcols, "level", "block").agg(
        _r6(F.avg(F.when(F.col("half") == 0, F.col("x")))).alias("ml"),
        _r6(F.avg(F.when(F.col("half") == 1, F.col("x")))).alias("mr"),
    )
    d = (
        F.when(F.col("ml").isNull() | F.col("mr").isNull(), F.lit(0.0))
        .otherwise((F.col("ml") - F.col("mr")) / 2.0
                   * F.pow(F.lit(2.0), F.col("level") / F.lit(2.0)))
    )
    return (
        halves.select(*gcols, "level", d.alias("d"))
        .groupBy(*gcols, "level")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            _r6(F.sum(F.col("d") * F.col("d"))).alias("energy"),
        )
    )
