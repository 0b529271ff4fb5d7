"""Session-9 operator batch: one-pass CUBE grouping-sets rollup,
MATCH_RECOGNIZE-style sequence pattern matching (batch + streaming),
RFM quintile segmentation, rolling OLS trend slope."""

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


# --------------------------------------------------- grouping-sets cube


def test_grouping_sets_four_tiers_consistent(spark):
    from cesium_spark.operators.rollup import rollup_grouping_sets

    rows = [
        (1, 10, "click", 1.0), (1, 20, "view", 2.0),
        (2, 86400 + 10, "click", 3.0), (2, 86400 + 20, "click", 4.0),
    ]
    out = {(r["gid"], r["event_type"], r["day"]): r
           for r in rollup_grouping_sets(_events(spark, rows)).collect()}
    # finest tier
    assert out[(0, "click", "1970-01-01")]["n_events"] == 1
    assert out[(0, "click", "1970-01-02")]["sum_m"] == 7.0
    # per-type all-time (day aggregated away -> bit 1)
    assert out[(1, "click", "(all)")]["n_events"] == 3
    assert out[(1, "click", "(all)")]["sum_m"] == 8.0
    # per-day all-types (type aggregated away -> bit 2)
    assert out[(2, "(all)", "1970-01-02")]["n_events"] == 2
    # grand total
    g = out[(3, "(all)", "(all)")]
    assert g["n_events"] == 4 and g["sum_m"] == 10.0 and g["avg_m"] == 2.5
    assert len(out) == 3 + 2 + 2 + 1  # (type,day) + type + day + total


def test_grouping_sets_plan_one_expand_one_exchange(spark):
    from cesium_spark.operators.rollup import rollup_grouping_sets

    rows = [(1, 10, "click", 1.0), (2, 20, "view", 2.0)]
    plan = rollup_grouping_sets(_events(spark, rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1  # partial agg absorbed map-side
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ----------------------------------------------------- sequence pattern


def _typed(spark, user_syms):
    """user_syms: {user: 'EVEP...'} symbol string -> events df, one event
    per char at 1s cadence per user."""
    names = {"C": "click", "V": "view", "E": "error",
             "P": "purchase", "S": "signup"}
    rows = []
    for u, s in user_syms.items():
        for i, ch in enumerate(s):
            rows.append((u, i, names[ch], 1.0))
    return _events(spark, rows)


def test_seq_pattern_greedy_leftmost_nonoverlapping(spark):
    from cesium_spark.operators.seqpattern import sequence_pattern_counts

    got = {r["user_id"]: r for r in sequence_pattern_counts(
        _typed(spark, {
            1: "EEPVEP",        # two matches: EEP, EP
            2: "EEEEEEEEEEP",   # 10 Es: greedy E{1,8} consumes last 8
            3: "PVC",           # no match
            4: "EPEPEP",        # three non-overlapping matches
        })).collect()}
    assert got[1]["n_matches"] == 2 and got[1]["first_match"] == "EEP"
    assert got[2]["n_matches"] == 1 and got[2]["first_match"] == "E" * 8 + "P"
    assert got[3]["n_matches"] == 0 and got[3]["first_match"] == ""
    assert got[4]["n_matches"] == 3 and got[4]["seq_len"] == 6


def test_seq_pattern_plan_no_window_no_python(spark):
    from cesium_spark.operators.seqpattern import sequence_pattern_counts

    plan = sequence_pattern_counts(_typed(spark, {1: "EP"})) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_streaming_pattern_matches_batch_across_boundary(spark, tmp_path):
    """A match SPANNING the micro-batch boundary (errors in batch 1,
    purchase in batch 2) is found exactly once, and a >8-symbol
    unconsumed error tail truncates EXACTLY like the batch regex."""
    import pandas as pd

    from cesium_spark.operators.seqpattern import sequence_pattern_counts
    from cesium_spark.streaming.stream import streaming_pattern_counts

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    t0 = pd.Timestamp("2025-01-01")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def rows(specs, base):
        return [(base + i,
                 (t0 + pd.Timedelta(seconds=base + i)).to_pydatetime(),
                 u, ty) for i, (u, ty) in enumerate(specs)]

    # user 7: EE | P -> one cross-boundary match EEP
    # user 8: 10 errors | P -> exactly the batch greedy E{8}P
    # user 9: EP | EP -> one match per batch
    b1 = rows([(7, "error"), (7, "error")]
              + [(8, "error")] * 10
              + [(9, "error"), (9, "purchase")], 0)
    b2 = rows([(7, "purchase"), (8, "purchase"),
               (9, "error"), (9, "purchase")], 100)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(in_dir)

    def drain():
        src = spark.readStream.schema(schema).parquet(in_dir)
        q = (streaming_pattern_counts(src).writeStream
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    drain()

    emitted = spark.read.parquet(out_dir).toPandas()
    latest = emitted.sort_values("seq_len").groupby("user_id").last()
    want = sequence_pattern_counts(
        spark.createDataFrame(b1 + b2, schema)).toPandas() \
        .set_index("user_id")
    for u in want.index:
        for c in ("seq_len", "n_matches", "first_match"):
            assert latest.loc[u, c] == want.loc[u, c], (u, c)
    assert latest.loc[7, "n_matches"] == 1
    assert latest.loc[8, "first_match"] == "E" * 8 + "P"
    assert latest.loc[9, "n_matches"] == 2


# ------------------------------------------------------------------ RFM


def test_rfm_scores_directions_and_code(spark):
    from cesium_spark.operators.segment import rfm_scores

    # 5 actors with strictly increasing activity/recency/spend so every
    # quintile has exactly one actor and directions are unambiguous
    rows = []
    for u in range(1, 6):
        for i in range(u):  # frequency = u
            rows.append((u, 86400 * u + i, "click", 0.0))
        rows.append((u, 86400 * u + 100, "purchase", 10.0 * u))
    ev = _events(spark, rows)
    got = {r["user_id"]: r for r in rfm_scores(ev).collect()}
    # actor 5 is most recent, most frequent, highest spend -> 555
    assert got[5]["rfm"] == 555
    assert got[1]["rfm"] == 111
    assert got[3]["recency_days"] == 2  # last event 2 days before max
    assert got[2]["frequency"] == 3  # 2 clicks + 1 purchase
    assert got[4]["monetary"] == 40.0  # only purchase value counts


def test_rfm_no_purchase_actor_monetary_zero(spark):
    from cesium_spark.operators.segment import rfm_scores

    ev = _events(spark, [(1, 0, "click", 5.0), (2, 10, "purchase", 7.0)])
    got = {r["user_id"]: r for r in rfm_scores(ev).collect()}
    assert got[1]["monetary"] == 0.0 and got[2]["monetary"] == 7.0


# -------------------------------------------------------- rolling slope


def test_rolling_slope_recovers_linear_trend(spark):
    from cesium_spark.operators.trend import rolling_slope

    # hourly means exactly 2*i + 5 -> slope exactly 2 everywhere
    rows = [(1, 3600 * i, "click", 2.0 * i + 5.0) for i in range(48)]
    out = rolling_slope(_events(spark, rows), min_obs=2).collect()
    assert len(out) == 47  # first row has n_obs=1 < 2
    assert all(abs(r["slope"] - 2.0) < 1e-9 for r in out)
    # frame saturates at 24 hours
    assert max(r["n_obs"] for r in out) == 24


def test_rolling_slope_range_frame_shortens_on_gaps(spark):
    from cesium_spark.operators.trend import rolling_slope

    # hours 0..9 then a 40-hour gap then hours 50..59: the RANGE frame
    # must NOT reach across the gap (a 24-ROW frame would)
    hours = list(range(10)) + list(range(50, 60))
    rows = [(1, 3600 * h, "click", float(h)) for h in hours]
    out = {r["hour"].hour + 24 * (r["hour"].day - 1): r
           for r in rolling_slope(_events(spark, rows), min_obs=1).collect()}
    assert out[9]["n_obs"] == 10
    assert out[50 % 24 + 24 * (50 // 24)]["n_obs"] == 1  # gap resets reach
    assert out[59 % 24 + 24 * (59 // 24)]["n_obs"] == 10
    # slope is 1.0 wherever defined (values = hour index)
    for k, r in out.items():
        if r["n_obs"] >= 2:
            assert abs(r["slope"] - 1.0) < 1e-9, (k, r)


def test_rolling_slope_plan_grid_window_no_python(spark):
    from cesium_spark.operators.trend import rolling_slope

    rows = [(1, 3600 * i, "click", float(i)) for i in range(30)]
    plan = rolling_slope(_events(spark, rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
