"""Session-10 operator batch: relational matrix profile (lag-decomposed
STOMP), KMV/theta sketch set intersection, and the streamed rolling-OLS
slope's shared grid tail."""

import math

import numpy as np
from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, sec, event_type, value) -> events-shaped df."""
    data = [
        (int(u), int(i), et, float(s), None if v is None else float(v))
        for i, (u, s, et, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "user_id long, event_id long, event_type string, sec double, "
        "value double",
    )
    return df.select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"), "value",
    )


# ------------------------------------------------------- matrix profile


def _brute_mp(y, m, excl):
    """Reference z-normalized matrix profile, straight from the Yeh et
    al. definition (O(n^2) loops, no recurrence)."""
    n = len(y) - m + 1
    mus = np.array([y[i:i + m].mean() for i in range(n)])
    sigs = np.array([y[i:i + m].std() for i in range(n)])
    out = []
    for i in range(n):
        best = (math.inf, -1)
        for j in range(n):
            if abs(i - j) < excl:
                continue
            dot = float(np.dot(y[i:i + m], y[j:j + m]))
            corr = (dot - m * mus[i] * mus[j]) / (
                m * max(sigs[i] * sigs[j], 1e-9))
            d = math.sqrt(round(max(2.0 * m * (1.0 - corr), 0.0), 6))
            d = round(d, 6)
            if (d, j) < best:
                best = (d, j)
        out.append((i, best[0], best[1]))
    return out


def test_matrix_profile_matches_bruteforce(spark):
    from cesium_spark.operators.matrixprofile import matrix_profile

    rng = np.random.RandomState(7)
    # a planted motif: hours 3-10 and 20-27 carry the same shape
    y = rng.rand(32).round(3) * 10
    motif = np.array([1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 1.5, 7.0])
    y[3:11] = motif
    y[20:28] = motif + 0.0
    rows = [(1, 3600 * h, "a", float(v)) for h, v in enumerate(y)]
    got = {
        r["i"]: (r["mp_dist"], r["nn_i"])
        for r in matrix_profile(_events(spark, rows), m=8).collect()
    }
    want = _brute_mp(y, m=8, excl=4)
    assert len(got) == len(want) == 32 - 8 + 1
    for i, d, j in want:
        gd, gj = got[i]
        assert abs(gd - d) < 1e-6, (i, gd, d)
        assert gj == j, (i, gj, j)
    # the planted motif is each other's nearest neighbor at distance ~0
    assert got[3][1] == 20 and got[20][1] == 3
    assert got[3][0] < 1e-5


def test_matrix_profile_per_key_and_flat_guard(spark):
    from cesium_spark.operators.matrixprofile import matrix_profile

    rows = [(1, 3600 * h, "a", float(h % 5)) for h in range(16)]
    rows += [(1, 3600 * h, "b", 2.0) for h in range(12)]  # flat: sigma=0
    out = matrix_profile(_events(spark, rows), m=8).toPandas()
    assert set(out["event_type"]) == {"a", "b"}
    # flat windows hit the sigma guard, never NaN/inf. 12 points give
    # window starts 0..4, but only i=0 and i=4 have a neighbor outside
    # the exclusion zone (|i-j| >= 4) — starts with NO valid neighbor
    # emit no row (brute force would say MP = inf there)
    b = out[out["event_type"] == "b"]
    assert sorted(b["i"]) == [0, 4]
    assert np.isfinite(b["mp_dist"]).all()
    # profiles never cross keys
    a = out[out["event_type"] == "a"]
    assert a["nn_i"].max() <= 16 - 8


def test_matrix_profile_no_cartesian(spark):
    from cesium_spark.operators.matrixprofile import matrix_profile

    rows = [(1, 3600 * h, "a", float(h % 7)) for h in range(20)]
    plan = matrix_profile(_events(spark, rows), m=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------- KMV / theta


def test_theta_exact_regime_matches_truth(spark):
    from cesium_spark.operators.sketch import theta_intersection_pairs

    # n_distinct << k on every side -> sketch retains everything, all
    # estimates are EXACT counts
    rows = []
    sec = 0
    for u in range(30):
        rows.append((u, sec, "a", 1.0)); sec += 1
    for u in range(10, 50):
        rows.append((u, sec, "b", 1.0)); sec += 1
    for u in range(45, 60):
        rows.append((u, sec, "c", 1.0)); sec += 1
    out = {(r["type_a"], r["type_b"]): r
           for r in theta_intersection_pairs(
               _events(spark, rows), k=256).collect()}
    ab = out[("a", "b")]
    assert ab["est_a"] == 30.0 and ab["est_b"] == 40.0
    assert ab["est_inter"] == 20.0 and ab["exact_inter"] == 20
    assert abs(ab["jaccard_est"] - 20.0 / 50.0) < 1e-9
    bc = out[("b", "c")]
    assert bc["est_inter"] == 5.0 and bc["exact_inter"] == 5
    ac = out[("a", "c")]
    assert ac["est_inter"] == 0.0 and ac["exact_inter"] == 0


def test_theta_estimate_regime_tracks_truth(spark):
    from cesium_spark.operators.sketch import theta_intersection_pairs

    # 2000 users in a, 2000 in b, 1000 shared; k=64 -> both sketches
    # saturate and estimate. KMV relative error ~ 1/sqrt(k-1) ~ 13%,
    # intersection error grows with 1/J — allow 4 sigma.
    rows = []
    sec = 0
    for u in range(2000):
        rows.append((u, sec, "a", 1.0)); sec += 1
    for u in range(1000, 3000):
        rows.append((u, sec, "b", 1.0)); sec += 1
    out = theta_intersection_pairs(_events(spark, rows), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_inter"] == 1000
    assert abs(r["est_a"] - 2000) / 2000 < 0.5
    assert abs(r["est_b"] - 2000) / 2000 < 0.5
    assert abs(r["est_inter"] - 1000) / 1000 < 0.55
    assert 0.05 < r["jaccard_est"] < 0.8  # truth 1/3


def test_theta_null_values_ignored(spark):
    from cesium_spark.operators.sketch import theta_intersection_pairs

    rows = [(1, 0, "a", 1.0), (2, 1, "a", 1.0), (1, 2, "b", 1.0)]
    df = _events(spark, rows).withColumn(
        "user_id",
        F.when(F.col("user_id") == 2, F.lit(None)).otherwise(
            F.col("user_id")),
    )
    out = theta_intersection_pairs(df, k=16).collect()
    assert len(out) == 1
    assert out[0]["est_a"] == 1.0 and out[0]["exact_inter"] == 1


# ------------------------------------------- shared rolling-slope tail


def test_rolling_slope_from_grid_equals_batch(spark):
    """rolling_slope == rolling_slope_from_grid over the grid it builds —
    the structural identity the streaming head relies on."""
    from cesium_spark.operators.trend import (rolling_slope,
                                              rolling_slope_from_grid)

    rng = np.random.RandomState(3)
    rows = []
    sec = 0
    for h in range(40):
        for _ in range(rng.randint(1, 4)):
            rows.append((1, 3600 * h + rng.randint(0, 3600), "a",
                         float(h) * 0.5 + rng.rand()))
            sec += 1
    ev = _events(spark, rows)
    batch = rolling_slope(ev).toPandas().sort_values(
        ["event_type", "hour"]).reset_index(drop=True)
    hour_idx = (F.unix_micros(F.date_trunc("hour", F.col("ts")))
                / F.lit(3600e6)).cast("long")
    grid = (
        ev.select("event_type", hour_idx.alias("h"),
                  F.col("value").alias("_v"))
        .groupBy("event_type", "h")
        .agg(F.round(F.avg("_v") + F.lit(1e-9), 6).alias("y"))
    )
    via_grid = rolling_slope_from_grid(grid).toPandas().sort_values(
        ["event_type", "hour"]).reset_index(drop=True)
    assert batch.equals(via_grid)
