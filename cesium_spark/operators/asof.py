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

__all__ = ["asof_join", "asof_nearest"]


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
    ``value_cols``, NULLs first) — without this the carried mark would
    depend on physical row order and vary across partitionings. The
    carried result is always one WHOLE right row (the winning row's
    NULLs carry as NULLs; columns are never stitched from different
    rows). DuckDB's ASOF leaves the same tie unspecified, so oracles
    comparing against it should pre-aggregate the right side to one row
    per (key, ts)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key_col, ts_col)
    ]
    # the right row rides as ONE struct (match ts + value columns): the
    # carried result is therefore always a WHOLE right row — per-column
    # carries could stitch together columns from different tied rows
    # when some values are NULL, which is not a row that ever existed
    r_row = F.struct(
        ts_micros(F.col(ts_col)).alias("_ts_us"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    r_type = right.select(r_row.alias("s")).schema["s"].dataType
    l_tag = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        l_struct.alias("_left"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_left"),
        r_row.alias("_r"),
    )
    # side 0 sorts before side 1 at equal ts -> a right row at exactly
    # left.ts is visible to that left row (<= semantics). The trailing
    # _r struct key orders right rows at an identical (key, ts) so
    # last() deterministically carries the GREATEST value tuple
    # (lexicographic over value_cols); left rows are NULL there and
    # inert to it.
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            ts_micros(F.col(ts_col)), "_side", F.col("_r").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    )
    stale = (
        None
        if tolerance_seconds is None
        else (ts_micros(F.col(ts_col)) - F.col("_c._ts_us"))
        > int(tolerance_seconds * 1e6)
    )
    out_vals = []
    for c in value_cols:
        v = F.col(f"_c.{c}")
        if stale is not None:
            v = F.when(stale, F.lit(None)).otherwise(v)
        out_vals.append(v.alias(f"{c}{suffix}"))
    return (
        carried.filter(F.col("_side") == 1)
        .select(*[F.col(f"_left.{c}").alias(c) for c in left.columns], *out_vals)
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-neighbor as-of join: each left row picks up the right
    row whose timestamp is CLOSEST (either direction) per key, with
    ties at equal distance resolving to the backward (at-or-before)
    match — pandas ``merge_asof(direction="nearest")`` semantics.
    `tolerance_seconds` bounds the distance on BOTH sides.

    Same union-window construction as `asof_join` — still ONE shuffle
    on the series key and no join node: the backward candidate is a
    running `last(ignorenulls)` and the forward candidate a
    `first(ignorenulls)` over the mirrored frame, two Window nodes
    sharing one Exchange. Ties among right rows at the identical
    (key, ts) resolve to the GREATEST value tuple on both sides (the
    `asof_join` convention), so results are partitioning-independent.

    Returns left + ``{value_col}{suffix}`` + ``asof_dt_us`` (the
    signed microsecond distance to the matched right row, negative if
    the match is in the past; NULL when nothing matched within
    tolerance)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key_col, ts_col)
    ]
    r_row = F.struct(
        ts_micros(F.col(ts_col)).alias("_ts_us"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    r_type = right.select(r_row.alias("s")).schema["s"].dataType
    l_tag = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        l_struct.alias("_left"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_left"),
        r_row.alias("_r"),
    )
    ts_us = ts_micros(F.col(ts_col))
    # backward pass: right (side 0) before left at equal ts -> <= visible;
    # greatest value tuple wins a (key, ts) tie via the asc _r sort key
    wb = (
        Window.partitionBy(key_col)
        .orderBy(ts_us, "_side", F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward pass: left before right at equal ts (1 - side) -> >= visible;
    # desc _r makes first() pick the same greatest-tuple winner
    wf = (
        Window.partitionBy(key_col)
        .orderBy(ts_us, (F.lit(1) - F.col("_side")), F.col("_r").desc_nulls_last())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last("_r", ignorenulls=True).over(wb).alias("_cb"),
        F.first("_r", ignorenulls=True).over(wf).alias("_cf"),
    )
    db = ts_us - F.col("_cb._ts_us")          # >= 0
    df_ = F.col("_cf._ts_us") - ts_us         # >= 0
    tol = None if tolerance_seconds is None else int(tolerance_seconds * 1e6)
    ok_b = F.col("_cb").isNotNull() & (F.lit(True) if tol is None else (db <= tol))
    ok_f = F.col("_cf").isNotNull() & (F.lit(True) if tol is None else (df_ <= tol))
    use_b = ok_b & (~ok_f | (db <= df_))      # tie -> backward
    win = F.when(use_b, F.col("_cb")).when(ok_f, F.col("_cf"))
    dt = F.when(use_b, -db).when(ok_f, df_).cast("long")
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_left.{c}").alias(c) for c in left.columns],
            *[win[c].alias(f"{c}{suffix}") for c in value_cols],
            dt.alias("asof_dt_us"),
        )
    )
