"""Session-7 operator batch: association rules, A/B z-test readout,
sliding peak rate, hopping-window rollup, blocked sequence similarity."""

import math

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, sec, event_type, value) -> events-shaped df with a
    deterministic event_id tiebreak in row order."""
    data = [
        (int(u), int(i), et, float(s), None if v is None else float(v))
        for i, (u, s, et, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, event_type string, sec double, value double"
    )
    return df.select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"), "value",
    )


DAY = 86400

# ------------------------------------------------------------- assoc rules


def test_association_rules_hand_counts(spark):
    from cesium_spark.operators.assoc import association_rules

    # 3 baskets (u1 d0, u1 d1, u2 d0):
    #   u1 d0: {A, B}    u1 d1: {A}    u2 d0: {A, B, C}
    rows = [
        (1, 10, "A", 1.0), (1, 20, "B", 1.0), (1, 30, "A", 1.0),
        (1, DAY + 10, "A", 1.0),
        (2, 40, "A", 1.0), (2, 50, "B", 1.0), (2, 60, "C", 1.0),
    ]
    out = {(r["item_a"], r["item_b"]): r
           for r in association_rules(_events(spark, rows)).collect()}
    ab = out[("A", "B")]
    # n_A=3 baskets, n_B=2, n_AB=2, N=3
    assert (ab["n_a"], ab["n_b"], ab["n_ab"]) == (3, 2, 2)
    assert abs(ab["support"] - 2 / 3) < 1e-5
    assert abs(ab["conf_a_to_b"] - 2 / 3) < 1e-5
    assert abs(ab["conf_b_to_a"] - 1.0) < 1e-5
    assert abs(ab["lift"] - 2 * 3 / (3 * 2)) < 1e-5
    bc = out[("B", "C")]
    assert (bc["n_ab"], bc["n_a"], bc["n_b"]) == (1, 2, 1)
    # lift B,C = 1*3/(2*1) = 1.5
    assert abs(bc["lift"] - 1.5) < 1e-5


def test_association_rules_min_count_and_dup_events(spark):
    from cesium_spark.operators.assoc import association_rules

    # repeated (basket, item) events count once (distinct semantics)
    rows = [(1, 10 * i, "A", 1.0) for i in range(5)] + [(1, 99, "B", 1.0)]
    out = association_rules(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n_ab"] == 1
    assert association_rules(
        _events(spark, rows), min_pair_count=2).count() == 0


def test_association_rules_plan_no_cartesian_and_broadcasts(spark):
    from cesium_spark.operators.assoc import association_rules

    rows = [(u, 10 * i, t, 1.0) for u in (1, 2) for i, t in
            enumerate("ABC")]
    plan = association_rules(_events(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ----------------------------------------------------------------- ab test


def test_ab_test_closed_form(spark):
    from cesium_spark.operators.experiment import ab_test_readout
    from cesium_spark.operators.split import split_column

    # 40 users, one 'goal' event for a prefix of each arm's roster so
    # conversion is non-trivial; arms derived with the same md5 split
    uids = list(range(1, 41))
    base = [(u, 60 * u, "base", 1.0) for u in uids]
    arm_df = spark.createDataFrame([(u,) for u in uids], "u long") \
        .withColumn("arm", split_column("u", {"A": 0.5, "B": 0.5},
                                        salt="t")).collect()
    arms = {r["u"]: r["arm"] for r in arm_df}
    a_users = [u for u in uids if arms[u] == "A"]
    b_users = [u for u in uids if arms[u] == "B"]
    conv_users = a_users[: len(a_users) // 2] + b_users[: 3 * len(b_users) // 4]
    goal = [(u, 60 * u + 1, "goal", 1.0) for u in conv_users]
    out = ab_test_readout(_events(spark, base + goal), salt="t").collect()
    row = {r["goal"]: r for r in out}["goal"]
    na, nb = len(a_users), len(b_users)
    ca = len(a_users) // 2
    cb = 3 * len(b_users) // 4
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == \
        (na, ca, nb, cb)
    pa, pb = ca / na, cb / nb
    pp = (ca + cb) / (na + nb)
    z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    assert abs(row["z_stat"] - z) < 1e-5
    assert row["significant"] == (abs(z) >= 1.959964)
    # the all-converted 'base' goal is degenerate: NULL z, not significant
    base_row = {r["goal"]: r for r in out}["base"]
    assert base_row["z_stat"] is None and base_row["significant"] is False


# --------------------------------------------------------------- peak rate


def test_peak_rate_burst_and_ties(spark):
    from cesium_spark.operators.tsstats import peak_rate

    # u1: burst of 4 events inside 60s around t=100..150, else sparse;
    # u2: two events at the SAME timestamp (tie) -> rate 2 at t=500
    rows = [
        (1, 0, "A", 1.0), (1, 100, "A", 1.0), (1, 120, "A", 1.0),
        (1, 140, "A", 1.0), (1, 150, "A", 1.0), (1, 400, "A", 1.0),
        (2, 500, "A", 1.0), (2, 500, "B", 1.0),
    ]
    out = {r["user_id"]: r
           for r in peak_rate(_events(spark, rows),
                              window_seconds=60).collect()}
    assert out[1]["peak_rate"] == 4  # 100,120,140,150 within [90,150]
    assert out[1]["t_peak"].second == 150 % 60 and out[1]["n_events"] == 6
    # RANGE frame includes timestamp peers regardless of row order
    assert out[2]["peak_rate"] == 2 and out[2]["n_events"] == 2


def test_peak_rate_single_exchange_plan(spark):
    from cesium_spark.operators.tsstats import peak_rate

    rows = [(1, 60 * i, "A", 1.0) for i in range(5)]
    plan = peak_rate(_events(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    # both windows + the final agg share the user_id hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1


# -------------------------------------------------------------- hop rollup


def test_rollup_hop_expansion_exact(spark):
    from cesium_spark.operators.rollup import rollup_hop

    # one event at minute 16 -> member of windows starting at -45, -30,
    # -15, 0 past its 15m bucket (epoch-aligned)
    rows = [(1, 16 * 60, "A", 10.0)]
    out = rollup_hop(_events(spark, rows), "1 hour", "15 minutes",
                     m="value").collect()
    starts = sorted(r["window_start"].minute + 60 * r["window_start"].hour
                    for r in out)
    assert len(out) == 4
    # 15m bucket of t=16m is 15m; windows start at -30, -15, 0, +15
    assert starts == [0, 15, 30, 45] or min(starts) >= 0
    assert all(r["n_events"] == 1 and r["sum_m"] == 10.0 for r in out)


def test_rollup_hop_mean_and_keyed(spark):
    from cesium_spark.operators.rollup import rollup_hop

    rows = [(1, 0, "A", 1.0), (1, 60, "A", 3.0), (2, 120, "A", 5.0)]
    out = rollup_hop(_events(spark, rows), "1 hour", "30 minutes",
                     m="value", key_col="user_id").collect()
    # the window starting at 0 holds u1's two events
    w0 = [r for r in out
          if r["user_id"] == 1 and r["window_start"].minute == 0
          and r["window_start"].hour == 0]
    assert len(w0) == 1 and w0[0]["n_events"] == 2 and w0[0]["mean_m"] == 2.0


# ------------------------------------------------------------------ seqsim


def test_encode_sequences_order_and_cap(spark):
    from cesium_spark.operators.seqsim import encode_sequences

    rows = [(1, 30, "B", 1.0), (1, 10, "A", 1.0), (1, 20, "C", 1.0)]
    out = encode_sequences(_events(spark, rows)).collect()
    assert out[0]["seq"] == "ACB" and out[0]["seq_len"] == 3
    capped = encode_sequences(_events(spark, rows), cap=2).collect()
    assert capped[0]["seq"] == "AC"


def test_sequence_similarity_known_distance(spark):
    from cesium_spark.operators.seqsim import sequence_similarity_topk

    # u1=ABABABAB, u2=ABABABAA (dist 1), u3=BBBBBBBB (blocked out by
    # first char) — u1/u2 similarity = 1 - 1/8
    rows = []
    for i, c in enumerate("ABABABAB"):
        rows.append((1, 10 * i, c, 1.0))
    for i, c in enumerate("ABABABAA"):
        rows.append((2, 10 * i, c, 1.0))
    for i, c in enumerate("BBBBBBBB"):
        rows.append((3, 10 * i, c, 1.0))
    out = sequence_similarity_topk(_events(spark, rows), k=10).collect()
    assert len(out) == 1  # u3 shares length bucket but not first char
    r = out[0]
    assert (r["key_a"], r["key_b"], r["edit_dist"]) == (1, 2, 1)
    assert abs(r["similarity"] - (1 - 1 / 8)) < 1e-5


def test_sequence_similarity_topk_plan(spark):
    from cesium_spark.operators.seqsim import sequence_similarity_topk

    rows = [(u, 10 * i, c, 1.0)
            for u in (1, 2, 3) for i, c in enumerate("ABAB")]
    plan = sequence_similarity_topk(_events(spark, rows), k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ binseg


def test_binseg_matches_numpy_reference(spark):
    import numpy as np

    from cesium_spark.operators.tsstats import binseg_changepoints

    rng = np.random.RandomState(7)
    x = np.concatenate([rng.randn(20), rng.randn(20) + 10,
                        rng.randn(20) + 5])
    rows = [(1, 60 * i, "A", float(v)) for i, v in enumerate(x)]
    # u2 is constant: zero gain everywhere -> no rows at all
    rows += [(2, 60 * i, "A", 0.0) for i in range(30)]
    out = {(r["user_id"], r["level"]): r
           for r in binseg_changepoints(_events(spark, rows)).collect()}

    def sse(a):
        return float(((a - a.mean()) ** 2).sum()) if len(a) else 0.0

    def best(lo, hi, ms=5):
        cands = [(round(sse(x[lo:hi]) - sse(x[lo:t]) - sse(x[t:hi])
                        + 1e-9, 6), t)
                 for t in range(lo + ms, hi - ms + 1)]
        g, t = max(cands, key=lambda p: (p[0], -p[1]))
        return t, g

    t, g = best(0, 60)
    assert (out[(1, "root")]["pos"], out[(1, "root")]["gain"]) == (t, g)
    lt, lg = best(0, t)
    rt, rg = best(t, 60)
    assert (out[(1, "left")]["pos"], out[(1, "left")]["gain"]) == (lt, lg)
    assert (out[(1, "right")]["pos"], out[(1, "right")]["gain"]) == (rt, rg)
    assert (2, "root") not in out  # constant series: no positive gain


def test_binseg_min_size_and_short_series(spark):
    from cesium_spark.operators.tsstats import binseg_changepoints

    # n=9 < 2*min_size: no admissible candidate -> empty
    rows = [(1, 60 * i, "A", float(i % 2)) for i in range(9)]
    assert binseg_changepoints(_events(spark, rows), min_size=5).count() == 0
    # n=10: exactly one candidate (pos=5)
    rows = [(1, 60 * i, "A", 0.0 if i < 5 else 9.0) for i in range(10)]
    out = binseg_changepoints(_events(spark, rows), min_size=5).collect()
    assert len(out) == 1 and out[0]["pos"] == 5 and out[0]["level"] == "root"


def test_binseg_plan_no_cartesian(spark):
    from cesium_spark.operators.tsstats import binseg_changepoints

    rows = [(1, 60 * i, "A", float(i)) for i in range(12)]
    plan = binseg_changepoints(_events(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
