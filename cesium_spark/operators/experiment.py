"""A/B experiment readout: two-proportion z-test over a hash split.

The standard online-experiment analysis (Kohavi et al., "Trustworthy
Online Controlled Experiments" §17: two-proportion pooled z-test):
users are deterministically assigned to arms by the same growth-stable
md5 bucketing as `operators.split` (so assignment is re-derivable and
stable under re-ingestion), a conversion goal is "user emitted at least
one event of type t", and per goal the readout reports both arms'
rates, the absolute lift, the pooled z statistic, and a 95% CI on the
difference.

Everything is closed-form SQL math — no Python in the plan:

- arm assignment is a map-only column expression on the user key;
- per-(goal, arm) conversion counts collapse through ONE distinct
  aggregate bounded by users x |types|;
- arm sizes are a 2-row relation attached by broadcast;
- output is |types| rows: driver-safe at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import split_column

__all__ = ["ab_test_readout"]

Z_95 = 1.959964  # two-sided 95% normal quantile, pinned for parity


def _r(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def ab_test_readout(
    df: DataFrame,
    key_col: str = "user_id",
    goal_col: str = "event_type",
    salt: str = "exp1",
    round_digits: int = 6,
) -> DataFrame:
    """Per conversion goal (distinct `goal_col` value), the A-vs-B
    readout::

      (goal, n_a, conv_a, rate_a, n_b, conv_b, rate_b, abs_lift,
       z_stat, significant)

    Arms are a 50/50 md5 split of `key_col` (salted). `significant`
    is |z| >= 1.959964 (two-sided 95%). Degenerate pooled variance
    (rate 0 or 1 in both arms combined) yields NULL z_stat.
    """
    users = (
        df.select(F.col(key_col).alias("_k")).distinct()
        .withColumn("_arm", split_column("_k", {"A": 0.5, "B": 0.5},
                                         salt=salt))
    )
    # arm sizes: 2-row relation
    sizes = users.groupBy("_arm").agg(F.count("*").cast("long").alias("n"))
    n_a = sizes.where(F.col("_arm") == "A").select(F.col("n").alias("n_a"))
    n_b = sizes.where(F.col("_arm") == "B").select(F.col("n").alias("n_b"))

    conv = (
        df.select(F.col(key_col).alias("_k"),
                  F.col(goal_col).alias("goal"))
        .distinct()
        .withColumn("_arm", split_column("_k", {"A": 0.5, "B": 0.5},
                                         salt=salt))
        .groupBy("goal")
        .agg(
            F.sum(F.when(F.col("_arm") == "A", 1).otherwise(0))
             .cast("long").alias("conv_a"),
            F.sum(F.when(F.col("_arm") == "B", 1).otherwise(0))
             .cast("long").alias("conv_b"),
        )
        .crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
    )

    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    var = pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    # NULL-divisor guard, not a WHEN: common-subexpression hoisting can
    # evaluate the division before a CASE filters it (PLANS.md r6 §gap_burstiness)
    z = (pb - pa) / F.sqrt(F.when(var > 0, var))
    return conv.select(
        "goal", "n_a", "conv_a", _r(pa, round_digits).alias("rate_a"),
        "n_b", "conv_b", _r(pb, round_digits).alias("rate_b"),
        _r(pb - pa, round_digits).alias("abs_lift"),
        _r(z, round_digits).alias("z_stat"),
        F.coalesce(F.abs(z) >= F.lit(Z_95), F.lit(False))
         .alias("significant"),
    )
