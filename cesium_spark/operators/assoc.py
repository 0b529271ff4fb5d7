"""Market-basket association rules over event streams.

The classic co-occurrence mining operator (Agrawal & Srikant 1994,
"Fast Algorithms for Mining Association Rules" — the support /
confidence / lift vocabulary): which event types co-occur within the
same activity basket more often than independence predicts?  The
reference engine's per-series features summarize a single measurement
stream (cesium/features/graphs.py); basket mining is a cross-type set
statistic it never had, but is a first-class question over transcript
events ("users who hit `error` in a day — do they also `purchase`?").

Scale shape (the reason this survives 100 TB):

- the stream first collapses to the DISTINCT (basket, item) relation —
  bounded by n_baskets x |types|, NOT by event volume; this is the only
  pass over the raw data and it is a single hash aggregate;
- the pair relation is an equi-self-join of that distinct relation on
  the basket key (AQE-splittable; per-basket fan-out is at most
  |types| choose 2, a constant for typed event streams);
- item totals are a |types|-sized relation and the basket count is a
  scalar — both attach via broadcast, never a shuffle;
- output is at most |types| choose 2 rows per direction: driver-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def _r(col, digits: int = 6):
    return F.round(col + F.lit(1e-9), digits)


def association_rules(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    basket: str = "day",
    min_pair_count: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise association rules over (key, time-bucket) baskets.

    A basket is one series' activity within one `basket` window
    (``date_trunc``). For every unordered item pair {a, b} with
    co-occurrence count >= `min_pair_count`, emits::

      (item_a, item_b, n_a, n_b, n_ab, support, conf_a_to_b,
       conf_b_to_a, lift)

    where support = n_ab / N (N = total baskets), confidence a->b =
    n_ab / n_a, and lift = n_ab * N / (n_a * n_b) — lift > 1 means the
    pair co-occurs more than independence predicts.
    """
    baskets = df.select(
        F.col(key_col).alias("_k"),
        F.date_trunc(basket, F.col(ts_col)).alias("_b"),
        F.col(item_col).alias("_i"),
    ).distinct()

    # scalar basket count, attached lazily via a 1-row crossJoin (the
    # lm.py discipline: no eager .collect() on the driver)
    n_baskets = (
        baskets.select("_k", "_b").distinct()
        .agg(F.count("*").cast("long").alias("n_baskets"))
    )
    # |types|-sized item totals: broadcast onto the pair relation
    item_counts = baskets.groupBy("_i").agg(
        F.count("*").cast("long").alias("n_item")
    )

    left = baskets.select("_k", "_b", F.col("_i").alias("item_a"))
    right = baskets.select("_k", "_b", F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, ["_k", "_b"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= F.lit(int(min_pair_count)))
    )

    out = (
        pairs
        .join(F.broadcast(item_counts.withColumnRenamed("_i", "item_a")
                          .withColumnRenamed("n_item", "n_a")), "item_a")
        .join(F.broadcast(item_counts.withColumnRenamed("_i", "item_b")
                          .withColumnRenamed("n_item", "n_b")), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    nab = F.col("n_ab").cast("double")
    return out.select(
        "item_a", "item_b", "n_a", "n_b", "n_ab",
        _r(nab / F.col("n_baskets"), round_digits).alias("support"),
        _r(nab / F.col("n_a"), round_digits).alias("conf_a_to_b"),
        _r(nab / F.col("n_b"), round_digits).alias("conf_b_to_a"),
        _r(nab * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
           round_digits).alias("lift"),
    )
