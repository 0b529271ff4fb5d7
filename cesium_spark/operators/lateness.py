"""Event-time lateness profiling: how out-of-order is this stream, and
what watermark would keep it?

Every streaming head in this engine (`streaming/stream.py`) either
assumes per-key in-order ingestion or relies on a watermark to bound
late data. This operator measures the assumption instead of guessing:
using arrival order (the monotone ingest id) against event time, it
reports the fraction of late events and the lateness quantiles — p99
lateness IS the watermark recommendation (Structured Streaming's
`withWatermark` delay is exactly "how late can an event be before I
drop it").

Cross-engine determinism: lateness is computed in exact integer
microseconds (running max over the arrival order, a frame over one
sort), quantiles use the shared linear-interpolation definition
(Spark `percentile` == DuckDB `quantile_cont`), and every emitted
second-valued double rounds at 6.

Plan shape: ONE sort-shuffle per key (the running event-time max is a
frame over arrival order) + a partial-aggregable groupBy. Scales with
the sort, never with driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lateness_profile"]


def lateness_profile(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-key out-of-orderness profile.

    An event is LATE when its event time precedes the maximum event
    time among all earlier-arriving events (strictly earlier by
    `arrival_col`); its lateness is that running max minus its own
    event time. The first-arriving event is on time by definition.

    Returns (key, n, n_late, frac_late, p50_late_s, p95_late_s,
    p99_late_s, max_late_s) — lateness quantiles over the LATE events
    only (NULL when none are late); p99_late_s is the standing
    watermark recommendation for this key.
    """
    from ..kernel import ts_micros

    us = ts_micros(F.col(ts_col))
    w_prev = (
        Window.partitionBy(key_col).orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(
        F.coalesce(F.max(us).over(w_prev) - us, F.lit(0)), F.lit(0))
    staged = df.select(key_col, late_us.alias("_late_us"))
    late_only = F.when(F.col("_late_us") > 0, F.col("_late_us"))
    qs = F.expr(
        "percentile(CASE WHEN _late_us > 0 THEN _late_us END, "
        "array(0.5, 0.95, 0.99))")
    r = lambda c: F.round(c + F.lit(1e-9), round_digits)  # noqa: E731
    per = staged.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.count(late_only).cast("long").alias("n_late"),
        qs.alias("_q"),
        F.max(late_only).alias("_max_us"),
    )
    return per.select(
        key_col, "n", "n_late",
        r(F.col("n_late") / F.col("n")).alias("frac_late"),
        r(F.element_at("_q", 1) / F.lit(1e6)).alias("p50_late_s"),
        r(F.element_at("_q", 2) / F.lit(1e6)).alias("p95_late_s"),
        r(F.element_at("_q", 3) / F.lit(1e6)).alias("p99_late_s"),
        r(F.col("_max_us") / F.lit(1e6)).alias("max_late_s"),
    )
