"""Dynamic-time-warping nearest neighbours over per-actor activity
series, with the UCR-suite pruning cascade re-expressed relationally
(Keogh & Ratanamahatana 2005: LB_Keogh lower-bounds band-constrained
DTW; Rakthanmanon et al., KDD 2012: search = cheap lower bound on all
pairs, exact DP only on the shortlist).

DTW is THE distance for "these two agents do the same thing on
different schedules" — Euclidean on the aligned grid calls a two-day
phase shift dissimilar; DTW inside a Sakoe-Chiba band absorbs it.

Distributed shape (deliberately NOT the serial UCR early-abandon
loop, which needs a running best-so-far and is sequential by nature):

1. regular per-actor grid (daily counts, zero-filled, z-normalised,
   rounded) — the same spine discipline as symbolic.hourly_count_grid;
2. LB_Keogh on ALL candidate pairs as one position equi-join: the
   candidate's band envelope [L, U] comes from a rangeBetween(-r, r)
   window (pure JVM), and the lower bound is a partial-aggregable sum
   of squared out-of-envelope deviations — pairs x gridlen rows, no
   Python, no DP;
3. exact banded DTW (numpy DP in one applyInPandas pass) ONLY on each
   query's top-``shortlist`` candidates by lower bound;
4. the answer is CERTIFIED exact when the best exact distance is <=
   the next unexplored candidate's lower bound (LB <= DTW, so nothing
   outside the shortlist can beat it) — the flag makes the
   prune-vs-exact tradeoff observable instead of silent.

At fleet scale the quadratic pair enumeration is the term to kill
first: pass ``pairs`` (e.g. same-SAX-word blocking from
symbolic.sax_motifs, or an LSH bucket join) to restrict candidates;
the default all-pairs is the exhaustive baseline the blocked variants
are measured against — the ann_recall discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["daily_z_grid", "series_sax_word", "lb_keogh_pairs",
           "dtw_nearest"]

_EPS = 1e-9


def daily_z_grid(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Per-key zero-filled daily event-count grid, z-normalised and
    rounded: (key, pos, z) with pos = days since the KEY's first active
    day. Constant series (sd = 0) are dropped — z-normalised DTW is
    undefined for them and every distance would tie at 0. Grid length
    is bounded by the key's day SPAN, never its event count."""
    days = (
        df.select(F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day"))
        .groupBy(key_col, "day")
        .agg(F.count("*").cast("long").alias("n"))
    )
    spine = (
        days.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col,
            "d0",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    grid = spine.join(days, [key_col, "day"], "left").select(
        key_col,
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("pos"),
        F.coalesce("n", F.lit(0)).cast("double").alias("x"),
    )
    stats = grid.groupBy(key_col).agg(
        F.avg("x").alias("mu"),
        # population sd from raw sums (exact integer arithmetic feeding
        # one float sqrt) — the cross-engine-stable variance form
        F.sqrt(
            F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
        ).alias("sd"),
    )
    return (
        grid.join(stats, key_col)
        .where(F.col("sd") > 0)
        .select(
            key_col,
            "pos",
            F.round((F.col("x") - F.col("mu")) / F.col("sd") + F.lit(_EPS), round_digits).alias("z"),
        )
    )


def series_sax_word(
    grid: DataFrame,
    segments: int = 4,
    key_col: str = "user_id",
) -> DataFrame:
    """Whole-series SAX word (Lin/Keogh): the z-grid PAA'd into
    ``segments`` equal slices (by position quantile so unequal spans
    still split evenly), each slice mean quantized at the 4-symbol
    gaussian breakpoints (-0.6745, 0, 0.6745) -> a short word like
    "adda". Series with the same word have the same coarse shape — the
    BLOCKING key that turns the quadratic LB_Keogh pair enumeration
    into within-bucket joins at fleet scale. Pure JVM: two bounded
    aggregations, no Python."""
    span = grid.groupBy(key_col).agg(
        (F.max("pos") + 1).alias("_len")
    )
    seg = grid.join(span, key_col).select(
        key_col,
        F.least(
            F.floor(F.col("pos") * segments / F.col("_len")),
            F.lit(segments - 1),
        ).cast("int").alias("seg"),
        "z",
    )
    paa = seg.groupBy(key_col, "seg").agg(F.avg("z").alias("m"))
    sym = (
        F.when(F.col("m") < -0.6745, F.lit("a"))
        .when(F.col("m") < 0.0, F.lit("b"))
        .when(F.col("m") < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        paa.select(key_col, "seg", sym.alias("s"))
        .groupBy(key_col)
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "s"))).s
            ).alias("word")
        )
    )


def lb_keogh_pairs(
    grid: DataFrame,
    band: int = 7,
    shortlist: int = 5,
    key_col: str = "user_id",
    round_digits: int = 6,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """Top-``shortlist`` candidates per query key by LB_Keogh lower
    bound (squared form — sqrt is monotone so ranking is unaffected;
    the emitted ``lb`` is the square root for unit comparability with
    dtw_dist). Envelope via rangeBetween(-band, band) window; the pair
    enumeration is a position equi-join so the bound is one partial-
    aggregable groupBy, no Python. Ties rank by candidate key.

    ``blocks``: optional (key, word) relation (series_sax_word). When
    given, the pair join key becomes (pos, word) — series in different
    blocks never pair, killing the quadratic enumeration term that
    dominates at fleet scale; recall vs the exhaustive baseline is
    measured by the dtw_recall driver query (the ann_recall
    discipline)."""
    join_keys = ["pos"]
    if blocks is not None:
        grid = grid.join(F.broadcast(blocks), key_col)
        join_keys = ["pos", "word"]
    wenv = Window.partitionBy(key_col).orderBy("pos").rangeBetween(-band, band)
    env = grid.select(
        F.col(key_col).alias("cand_id"),
        *(["word"] if blocks is not None else []),
        "pos",
        F.max("z").over(wenv).alias("u"),
        F.min("z").over(wenv).alias("l"),
    )
    q = grid.select(
        F.col(key_col).alias("qid"),
        *(["word"] if blocks is not None else []),
        "pos", "z",
    )
    dev = F.when(F.col("z") > F.col("u"), F.col("z") - F.col("u")).when(
        F.col("z") < F.col("l"), F.col("l") - F.col("z")
    ).otherwise(F.lit(0.0))
    lb2 = (
        q.join(env, join_keys)
        .where(F.col("qid") != F.col("cand_id"))
        .groupBy("qid", "cand_id")
        .agg(F.sum(dev * dev).alias("lb2"))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.sqrt(F.col("lb2")) + F.lit(_EPS), round_digits), "cand_id"
    )
    return (
        lb2.select(
            "qid",
            "cand_id",
            F.round(F.sqrt(F.col("lb2")) + F.lit(_EPS), round_digits).alias("lb"),
            F.row_number().over(wr).alias("rank"),
        )
        .where(F.col("rank") <= shortlist + 1)  # +1: the certification
        # frontier — rank shortlist+1's lb is the bar the best exact
        # distance must beat for the NN to be provably exact
    )


def _dtw_band(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Sakoe-Chiba banded DTW distance (sqrt of summed squared steps).
    O(n * band) DP — the exact kernel run only on the LB shortlist."""
    n, m = len(a), len(b)
    r = max(band, abs(n - m))  # band must cover the corner
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, np.inf)
        lo, hi = max(1, i - r), min(m, i + r)
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            d = ai - b[j - 1]
            cur[j] = d * d + min(prev[j], prev[j - 1], cur[j - 1])
        prev = cur
    return float(np.sqrt(prev[m]))


def dtw_nearest(
    df: DataFrame,
    band: int = 7,
    shortlist: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
    block_segments: int | None = None,
) -> DataFrame:
    """Exact-where-certified DTW nearest neighbour per key:
    (key, nn_id, dtw_dist, lb, certified). ``certified`` = 1 when the
    best exact distance <= the (shortlist+1)-th candidate's lower
    bound, i.e. no pruned candidate can possibly be closer.
    ``block_segments``: when set, candidates are restricted to series
    sharing the ``series_sax_word`` blocking key (the scale path —
    recall measured by the dtw_recall driver query)."""
    grid = daily_z_grid(df, key_col=key_col, ts_col=ts_col, round_digits=round_digits)
    blocks = (
        series_sax_word(grid, segments=block_segments, key_col=key_col)
        if block_segments else None
    )
    cand = lb_keogh_pairs(
        grid, band=band, shortlist=shortlist, key_col=key_col,
        round_digits=round_digits, blocks=blocks,
    )
    series = grid.groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "z"))).alias("s")
    ).select(key_col, F.col("s.z").alias("zs"))
    # shortlist pairs carry both arrays; the frontier lb rides along
    pairs = (
        cand.join(series.withColumnRenamed(key_col, "qid").withColumnRenamed("zs", "qz"), "qid")
        .join(series.withColumnRenamed(key_col, "cand_id").withColumnRenamed("zs", "cz"), "cand_id")
    )
    out_schema = (
        f"{key_col} long, nn_id long, dtw_dist double, lb double, certified int"
    )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in pdf.groupby("qid"):
            g = g.sort_values("rank")
            # rank shortlist+1, when present, is the certification
            # frontier: its lb is a floor on every pruned candidate's
            # true DTW distance. Absent frontier = we explored every
            # candidate, so the answer is exact by exhaustion.
            if int(g["rank"].max()) == shortlist + 1:
                frontier_lb = float(g.iloc[-1]["lb"])
                sl = g.iloc[:-1]
            else:
                frontier_lb = None
                sl = g
            best_d, best_id, best_lb = np.inf, None, None
            for _, row in sl.iterrows():
                d = _dtw_band(
                    np.asarray(row["qz"], dtype=np.float64),
                    np.asarray(row["cz"], dtype=np.float64),
                    band,
                )
                d = round(d + _EPS, round_digits)
                if d < best_d or (d == best_d and row["cand_id"] < best_id):
                    best_d, best_id, best_lb = d, row["cand_id"], float(row["lb"])
            certified = int(frontier_lb is None or best_d <= frontier_lb)
            rows.append((qid, best_id, best_d, best_lb, certified))
        return pd.DataFrame(
            rows, columns=[key_col, "nn_id", "dtw_dist", "lb", "certified"]
        )

    return pairs.groupBy("qid").applyInPandas(_score, out_schema)
