"""As-of join: align each left event with the most recent right event
(right.ts <= left.ts, greatest wins) per series key.

The classic time-series join (kdb aj, TimescaleDB/DuckDB ASOF JOIN; the
reference aligns label/meta rows per series statically — this is the
temporal generalization a rollup engine needs for e.g. joining config
changes, model versions, or price marks onto a turn stream).

Plan: the union-window construction — tag both streams, union, one
window per series ordered by (ts, side) carrying last(right value,
ignorenulls), then keep the left rows. ONE shuffle on the series key, no
join node at all, so there is no key-skew amplification and no broadcast:
the cost is a union-sized sort, which is the theoretical floor for
merge-style as-of semantics. `tolerance` bounds staleness (matches
farther back in time become NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel import ts_micros

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + ``{value_col}{suffix}`` columns from the latest right
    row at-or-before each left row's timestamp (per key). Right rows at
    the exact same timestamp DO match (<= semantics, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``).

    Ties among right rows sharing the exact same (key, ts) resolve
    deterministically to the GREATEST value tuple (lexicographic over
    ``value_cols``) — without this the carried mark would depend on
    physical row order and vary across partitionings. DuckDB's ASOF
    leaves the same tie unspecified, so oracles comparing against it
    should pre-aggregate the right side to one row per (key, ts)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key_col, ts_col)
    ]
    l_tag = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # side 0 sorts before side 1 at equal ts -> a right row at exactly
    # left.ts is visible to that left row (<= semantics). The trailing
    # _r_* keys order right rows at an identical (key, ts) so last()
    # deterministically carries the greatest value tuple; left rows have
    # NULL there and are inert to it (their relative order never affects
    # the carried right value).
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            ts_micros(F.col(ts_col)), "_side",
            *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("_side") == 0, ts_micros(F.col(ts_col))),
            ignorenulls=True,
        ).over(w).alias("_match_us"),
    )
    out_vals = []
    stale = (
        None
        if tolerance_seconds is None
        else (ts_micros(F.col(ts_col)) - F.col("_match_us"))
        > int(tolerance_seconds * 1e6)
    )
    for c in value_cols:
        v = F.col(f"_c_{c}")
        if stale is not None:
            v = F.when(stale, F.lit(None)).otherwise(v)
        out_vals.append(v.alias(f"{c}{suffix}"))
    return (
        carried.filter(F.col("_side") == 1)
        .select(*[F.col(f"_left.{c}").alias(c) for c in left.columns], *out_vals)
    )
