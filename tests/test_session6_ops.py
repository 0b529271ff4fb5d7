"""Session-6 operator batch: Markov stationary/NLL, inter-event
survival, Benford screen, session concurrency, LB_Keogh + banded DTW."""

import math

import pytest
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


# ---------------------------------------------------------------- markov


def test_markov_stationary_two_state_flip(spark):
    from cesium_spark.operators.markov import markov_stationary

    # A->B->A->B...: P is the exchange matrix, stationary = (0.5, 0.5)
    rows = [(1, 60 * i, "A" if i % 2 == 0 else "B", 1.0) for i in range(9)]
    out = {r["event_type"]: r["pi"]
           for r in markov_stationary(_events(spark, rows)).collect()}
    assert out == {"A": 0.5, "B": 0.5}


def test_markov_stationary_biased_chain(spark):
    from cesium_spark.operators.markov import markov_stationary

    # transitions: A->A x5, A->B x3, B->A x2 -> P = [[5/8, 3/8], [1, 0]];
    # balance: pi_B = (3/8) pi_A -> pi = (8/11, 3/11)
    seq = "AAABAABA" + "AAB"
    rows = [(1, 60 * i, c, 1.0) for i, c in enumerate(seq)]
    out = {r["event_type"]: r["pi"]
           for r in markov_stationary(_events(spark, rows), n_iter=40).collect()}
    # chain is periodic-free (self-loop) so iteration converges
    assert abs(out["A"] - 8 / 11) < 1e-3 and abs(out["B"] - 3 / 11) < 1e-3
    # pi is a rounded distribution
    assert abs(sum(out.values()) - 1.0) < 1e-5


def test_markov_nll_flags_rare_transition(spark):
    from cesium_spark.operators.markov import markov_nll

    rows = []
    # 4 users take A->B five times each; user 9 takes A->C once
    for u in range(1, 5):
        for i in range(6):
            rows.append((u, 60 * i, "A" if i % 2 == 0 else "B", 1.0))
    rows += [(9, 0, "A", 1.0), (9, 60, "C", 1.0)]
    out = {r["user_id"]: r for r in markov_nll(_events(spark, rows)).collect()}
    # corpus matrix: P(B|A) = 12/13, P(C|A) = 1/13, P(A|B) = 1
    rare_bits = -math.log2(1.0 / 13.0)
    assert out[9]["surprise_from"] == "A" and out[9]["surprise_to"] == "C"
    assert abs(out[9]["max_surprise_bits"] - rare_bits) < 1e-5
    assert abs(out[9]["nll_bits"] - rare_bits) < 1e-5  # its only transition
    # normal users' mean surprisal is far lower
    assert out[1]["nll_bits"] < 0.2
    assert out[1]["n_transitions"] == 5


# ------------------------------------------------------------- survival


def test_interevent_survival_exact_fractions(spark):
    from cesium_spark.operators.survival import interevent_survival

    # one user, gaps of 30s / 120s / 600s / 7200s, all opened by "e"
    secs = [0, 30, 150, 750, 7950]
    rows = [(1, s, "e", 1.0) for s in secs]
    out = {r["horizon_s"]: r
           for r in interevent_survival(_events(spark, rows)).collect()}
    assert set(out) == {60, 300, 900, 3600}
    assert out[60]["n_gaps"] == 4 and out[60]["n_surviving"] == 3
    assert out[60]["s_frac"] == 0.75
    assert out[300]["n_surviving"] == 2 and out[300]["s_frac"] == 0.5
    assert out[900]["n_surviving"] == 1 and out[3600]["n_surviving"] == 1
    # the final wait is right-censored, counted not dropped
    assert out[60]["n_censored"] == 1
    assert out[60]["mean_gap_s"] == round((30 + 120 + 600 + 7200) / 4 + 1e-9, 6)


def test_interevent_survival_attributes_to_opening_type(spark):
    from cesium_spark.operators.survival import interevent_survival

    # error opens a 600s wait, ok opens a 10s wait (twice)
    rows = [(1, 0, "ok", 1.0), (1, 10, "err", 1.0), (1, 610, "ok", 1.0),
            (1, 620, "err", 1.0)]
    out = {(r["event_type"], r["horizon_s"]): r
           for r in interevent_survival(
               _events(spark, rows), horizons_s=(60,)).collect()}
    assert out[("err", 60)]["n_gaps"] == 1
    assert out[("err", 60)]["s_frac"] == 1.0  # 600s > 60s
    assert out[("ok", 60)]["n_gaps"] == 2 and out[("ok", 60)]["s_frac"] == 0.0
    assert out[("err", 60)]["n_censored"] == 1  # last event is an err


# -------------------------------------------------------------- benford


def test_benford_screen_conforming_vs_constant(spark):
    from cesium_spark.operators.analytics import benford_screen

    # geometric sweep over 3 decades hits Benford closely; the "stuck"
    # feed always leads with digit 5
    rows = []
    n = 900
    for i in range(n):
        rows.append((1, i, "nat", 10.0 ** (3.0 * i / n)))
    for i in range(100):
        rows.append((2, 10000 + i, "stuck", 5.0 + 0.001 * i))
    rows.append((3, 20000, "stuck", None))  # skipped, not counted
    ev = _events(spark, [(u, s, et, v) for (u, s, et, v) in rows])
    out = benford_screen(ev).collect()
    nat = {r["digit"]: r for r in out if r["event_type"] == "nat"}
    stuck = {r["digit"]: r for r in out if r["event_type"] == "stuck"}
    assert len(nat) == 9 and len(stuck) == 9  # digit spine is complete
    assert nat[1]["nonconforming"] == 0 and nat[1]["mad"] < 0.01
    assert stuck[5]["n"] == 100 and stuck[5]["obs_frac"] == 1.0
    assert stuck[1]["n"] == 0  # missing digit scores full expected freq
    assert stuck[1]["nonconforming"] == 1 and stuck[1]["mad"] > 0.1
    assert stuck[1]["n_skipped"] == 1
    # expected fractions are the Benford curve
    assert abs(nat[1]["exp_frac"] - math.log10(2.0)) < 1e-6


def test_benford_first_digit_below_one(spark):
    from cesium_spark.operators.analytics import benford_screen

    # |v| < 1 still has a leading significant digit: 0.07 -> 7
    ev = _events(spark, [(1, 0, "t", 0.07), (1, 1, "t", -0.5)])
    out = {r["digit"]: r["n"] for r in benford_screen(ev).collect()
           if r["event_type"] == "t"}
    assert out[7] == 1 and out[5] == 1


# -------------------------------------------------- session concurrency


def test_session_concurrency_peak_and_carry(spark):
    from cesium_spark.operators.sessionize import session_concurrency

    h = 3600
    rows = []
    # three sessions inside hour 0 (one user each; 30m gap never splits)
    rows += [(1, 0, "e", 1.0), (1, 25 * 60, "e", 1.0),
             (1, 50 * 60, "e", 1.0)]                          # 00:00-00:50
    rows += [(2, 10 * 60, "e", 1.0), (2, 20 * 60, "e", 1.0)]  # 00:10-00:20
    rows += [(3, 15 * 60, "e", 1.0), (3, 30 * 60, "e", 1.0)]  # 00:15-00:30
    # one session crossing into hour 1: 00:40 -> 01:30
    rows += [(4, 40 * 60, "e", 1.0), (4, 65 * 60, "e", 1.0),
             (4, 90 * 60, "e", 1.0)]
    out = {r["hour"].hour: r for r in session_concurrency(
        _events(spark, rows), gap_minutes=30,
        key_col="user_id", ts_col="ts", tiebreak_col="event_id",
    ).collect()}
    assert out[0]["n_started"] == 4 and out[0]["n_ended"] == 3
    assert out[0]["carry_in"] == 0 and out[0]["peak_concurrent"] == 3
    assert out[1]["carry_in"] == 1 and out[1]["n_ended"] == 1
    assert out[1]["peak_concurrent"] == 1


def test_session_concurrency_minute_peak_bounds_event_peak(spark):
    from cesium_spark.operators.sessionize import session_concurrency

    # two sessions that only overlap within one minute: s1 ends 00:05:10,
    # s2 starts 00:05:40 — event-granular peak is 2 during 00:05;
    # minute-resolution counts the end as active through its minute -> 2
    rows = [(1, 0, "e", 1.0), (1, 310, "e", 1.0),
            (2, 340, "e", 1.0), (2, 600, "e", 1.0)]
    out = session_concurrency(
        _events(spark, rows), gap_minutes=30,
        key_col="user_id", ts_col="ts", tiebreak_col="event_id",
    ).collect()
    assert len(out) == 1 and out[0]["peak_concurrent"] == 2


# ------------------------------------------------------------ dtw / lb


def _daily_rows(u, counts, et="e"):
    """counts[d] events on day d for user u."""
    rows = []
    for d, c in enumerate(counts):
        for j in range(c):
            rows.append((u, d * 86400 + j * 60, et, 1.0))
    return rows


def test_daily_z_grid_zero_fill_and_znorm(spark):
    from cesium_spark.operators.dtw import daily_z_grid

    # day 1 has no events -> zero-filled; constant user dropped (sd=0)
    rows = _daily_rows(1, [2, 0, 4]) + _daily_rows(2, [3, 3, 3])
    g = daily_z_grid(_events(spark, rows)).collect()
    by_user = {}
    for r in g:
        by_user.setdefault(r["user_id"], {})[r["pos"]] = r["z"]
    assert 2 not in by_user  # constant series dropped
    zs = by_user[1]
    assert set(zs) == {0, 1, 2}
    # x = [2, 0, 4], mu = 2, sd = sqrt(8/3)
    sd = math.sqrt(8.0 / 3.0)
    assert abs(zs[0] - 0.0) < 1e-6
    assert abs(zs[1] - (-2.0 / sd)) < 1e-5 and abs(zs[2] - (2.0 / sd)) < 1e-5


def test_lb_keogh_identical_series_zero_bound(spark):
    from cesium_spark.operators.dtw import daily_z_grid, lb_keogh_pairs

    rows = (_daily_rows(1, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(2, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(3, [9, 1, 9, 1, 9, 1, 9, 1, 9, 1]))
    cand = lb_keogh_pairs(daily_z_grid(_events(spark, rows)),
                          band=2, shortlist=2).collect()
    ranked = {(r["qid"], r["cand_id"]): r for r in cand}
    assert ranked[(1, 2)]["lb"] == 0.0 and ranked[(1, 2)]["rank"] == 1
    assert ranked[(3, 1)]["lb"] > 0.0 or ranked[(3, 2)]["lb"] > 0.0


def test_dtw_nearest_exact_match_and_lb_bound(spark):
    from cesium_spark.operators.dtw import dtw_nearest

    rows = (_daily_rows(1, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(2, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(3, [9, 1, 9, 1, 9, 1, 9, 1, 9, 1]))
    out = {r["user_id"]: r for r in dtw_nearest(
        _events(spark, rows), band=2, shortlist=2).collect()}
    assert out[1]["nn_id"] == 2 and out[1]["dtw_dist"] == 0.0
    assert out[2]["nn_id"] == 1 and out[2]["dtw_dist"] == 0.0
    # only 2 candidates exist per query -> exhaustive -> certified
    assert all(r["certified"] == 1 for r in out.values())
    # LB never exceeds the exact banded distance
    assert all(r["lb"] <= r["dtw_dist"] + 1e-9 for r in out.values())


def test_dtw_band_kernel_matches_naive_reference():
    """The banded DP kernel == a textbook O(n*m) full-matrix DTW when the
    band covers the whole matrix, and is >= it when constrained."""
    import numpy as np

    from cesium_spark.operators.dtw import _dtw_band

    def naive_dtw(a, b):
        n, m = len(a), len(b)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d = (a[i - 1] - b[j - 1]) ** 2
                D[i, j] = d + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
        return float(np.sqrt(D[n, m]))

    rng = np.random.RandomState(7)
    for _ in range(5):
        a = rng.randn(12)
        b = rng.randn(15)
        full = naive_dtw(a, b)
        assert abs(_dtw_band(a, b, band=20) - full) < 1e-9
        assert _dtw_band(a, b, band=3) >= full - 1e-9


def test_dtw_absorbs_phase_shift_euclid_does_not(spark):
    from cesium_spark.operators.dtw import dtw_nearest

    # same sawtooth, u2 shifted by one day; u3 anti-phase square wave
    base = [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 1, 2, 3, 4, 5]
    shift = [5] + base[:-1]
    rows = (_daily_rows(1, base) + _daily_rows(2, shift)
            + _daily_rows(3, [7, 1, 7, 1, 7, 1, 7, 1, 7, 1, 7, 1, 7, 1, 7]))
    out = {r["user_id"]: r for r in dtw_nearest(
        _events(spark, rows), band=3, shortlist=2).collect()}
    # the warped twin wins over the anti-phase series; the residual
    # distance is boundary-edge cost only (first/last sample can't warp
    # past the series edge), far below the anti-phase alternative
    assert out[1]["nn_id"] == 2
    assert out[1]["dtw_dist"] < 4.0


def test_markov_entropy_rate_deterministic_chain_is_zero(spark):
    from cesium_spark.operators.markov import markov_entropy_rate

    # A->B->A->B: every conditional row is certain -> H = 0
    rows = [(1, 60 * i, "A" if i % 2 == 0 else "B", 1.0) for i in range(9)]
    out = markov_entropy_rate(_events(spark, rows)).collect()
    assert all(r["h_cond_bits"] == 0.0 for r in out)
    assert all(r["h_rate_bits"] == 0.0 for r in out)


def test_markov_entropy_rate_fair_coin_is_one_bit(spark):
    from cesium_spark.operators.markov import markov_entropy_rate

    # from A, exactly half the exits go to A and half to B (and same
    # from B): H(.|f) = 1 bit for both states -> rate = 1 bit/event
    seq = "AABB" * 8 + "A"  # AA, AB, BB, BA repeating -> 50/50 rows
    rows = [(1, 60 * i, c, 1.0) for i, c in enumerate(seq)]
    out = {r["event_type"]: r
           for r in markov_entropy_rate(_events(spark, rows)).collect()}
    for st in "AB":
        assert abs(out[st]["h_cond_bits"] - 1.0) < 0.01
    assert abs(out["A"]["h_rate_bits"] - 1.0) < 0.01
    assert abs(out["A"]["pi"] + out["B"]["pi"] - 1.0) < 1e-5


def test_gap_burstiness_metronome_and_alternation(spark):
    from cesium_spark.operators.survival import gap_burstiness

    rows = []
    # metronome: constant 60 s gaps -> sd = 0 -> B = -1
    rows += [(1, 60 * i, "tick", 1.0) for i in range(10)]
    # alternating 10 s / 110 s gaps -> strong NEGATIVE memory
    t, g = 0, 10
    for i in range(21):
        rows.append((2, t, "alt", 1.0))
        t += g
        g = 120 - g
    out = {r["event_type"]: r
           for r in gap_burstiness(_events(spark, rows)).collect()}
    assert out["tick"]["burstiness"] == -1.0
    assert out["tick"]["mean_gap_s"] == 60.0 and out["tick"]["sd_gap_s"] == 0.0
    assert out["tick"]["memory"] is None  # constant gaps -> no variance
    assert out["alt"]["memory"] is not None and out["alt"]["memory"] < -0.9
    assert out["alt"]["n_pairs"] == 19


def test_series_sax_word_and_blocking(spark):
    from cesium_spark.operators.dtw import (
        daily_z_grid, lb_keogh_pairs, series_sax_word,
    )

    # two low-high series share a word; one high-low series differs
    rows = (_daily_rows(1, [1, 1, 1, 1, 9, 9, 9, 9])
            + _daily_rows(2, [2, 2, 2, 2, 8, 8, 8, 8])
            + _daily_rows(3, [9, 9, 9, 9, 1, 1, 1, 1]))
    grid = daily_z_grid(_events(spark, rows))
    words = {r["user_id"]: r["word"]
             for r in series_sax_word(grid, segments=4).collect()}
    assert words[1] == words[2] and words[1] != words[3]
    # blocked enumeration: 1 and 2 pair with each other only
    cand = lb_keogh_pairs(grid, band=2, shortlist=3,
                          blocks=series_sax_word(grid, segments=4)).collect()
    pairs = {(r["qid"], r["cand_id"]) for r in cand}
    assert (1, 2) in pairs and (2, 1) in pairs
    assert all(3 not in p for p in pairs)  # lone word -> no candidates


def test_dtw_nearest_blocked_subset_of_full(spark):
    from cesium_spark.operators.dtw import dtw_nearest

    rows = (_daily_rows(1, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(2, [1, 2, 3, 4, 5, 4, 3, 2, 1, 2])
            + _daily_rows(3, [9, 1, 9, 1, 9, 1, 9, 1, 9, 1]))
    ev = _events(spark, rows)
    blk = {r["user_id"]: r for r in dtw_nearest(
        ev, band=2, shortlist=2, block_segments=4).collect()}
    # identical series share a word and still find each other exactly
    assert blk[1]["nn_id"] == 2 and blk[1]["dtw_dist"] == 0.0
    # blocked candidate set is a subset -> distance >= the full answer
    full = {r["user_id"]: r for r in dtw_nearest(
        ev, band=2, shortlist=2).collect()}
    for u, r in blk.items():
        assert r["dtw_dist"] >= full[u]["dtw_dist"] - 1e-9


def test_km_survival_hand_computed_with_censoring(spark):
    from cesium_spark.operators.survival import km_survival

    # observed gaps 10/20/30 s; censored waits 0/10/985 s (administrative
    # at the global max ts = 995). KM at 60 s:
    #   t=10: risk 5 (the 0 s censor dropped; the at-10 censor still at
    #   risk), d=1 -> 4/5; t=20: risk 3 -> 2/3; t=30: risk 2 -> 1/2
    #   S(60) = 4/5 * 2/3 * 1/2 = 4/15
    rows = [(1, 0, "e", 1.0), (1, 10, "e", 1.0),
            (2, 975, "e", 1.0), (2, 995, "e", 1.0),
            (3, 955, "e", 1.0), (3, 985, "e", 1.0)]
    out = {r["horizon_s"]: r for r in km_survival(
        _events(spark, rows), horizons_s=(5, 15, 60)).collect()}
    assert out[60]["n_total"] == 6
    assert out[60]["n_events_used"] == 3
    assert abs(out[60]["km_s"] - 4.0 / 15.0) < 1e-6
    assert abs(out[15]["km_s"] - 0.8) < 1e-6 and out[15]["n_events_used"] == 1
    # horizon below the first event time: no information, NULL not 1.0
    assert out[5]["km_s"] is None and out[5]["n_events_used"] == 0


def test_km_censored_at_zero_still_at_risk_at_zero(spark):
    from cesium_spark.operators.survival import km_survival

    # every actor's last event sits AT the global max -> 4 censored
    # waits of 0 s. Censored-at-t stays at risk AT t, so they are in
    # the t=0 risk set (with the one observed 0 s gap) and drop only
    # after it:
    #   t=0:  risk 12, d=1 -> 11/12   (obs gaps incl. actor 4's 0 gap)
    #   t=10: risk 7,  d=2 -> 5/7
    #   t=20: risk 5,  d=2 -> 3/5
    #   S(25) = 11/12 * 5/7 * 3/5 = 11/28
    rows = []
    for u, g in enumerate((10, 20, 30, 40), start=1):
        rows += [(u, 0, "e", 1.0), (u, g, "e", 1.0), (u, 40, "e", 1.0)]
    out = {r["horizon_s"]: r for r in km_survival(
        _events(spark, rows), horizons_s=(25,)).collect()}
    r = out[25]
    assert r["n_total"] == 12  # 8 observed + 4 censored
    assert abs(r["km_s"] - 11.0 / 28.0) < 1e-6
    assert r["n_events_used"] == 5  # steps at 0, 10, 10, 20, 20


def test_weibull_fit_recovers_exponential_shape(spark):
    import math as m

    from cesium_spark.operators.survival import weibull_fit

    # gaps drawn at exponential quantiles (lambda = 100 s): the Weibull
    # plot regression must recover k ~ 1 and lambda ~ 100
    n = 60
    t, rows = 0, []
    for i in range(n + 1):
        rows.append((1, int(t), "e", 1.0))
        u = (i + 0.5) / (n + 1)
        t += -m.log(1.0 - u) * 100.0
    out = weibull_fit(_events(spark, rows)).collect()[0]
    assert out["n_points"] >= 30
    assert abs(out["k_shape"] - 1.0) < 0.15
    assert abs(out["lambda_s"] - 100.0) < 25.0
    assert out["r2"] > 0.97


def test_tail_index_pareto_recovery_and_top_share(spark):
    from cesium_spark.operators.analytics import activity_tail_index

    # activity drawn at Pareto(alpha=2, xmin=10) quantiles: x_q =
    # xmin * (1-q)^(-1/2) -> Hill over the top-100 recovers alpha ~ 2
    rows = []
    n = 400
    eid = 0
    for i in range(n):
        q = (i + 0.5) / n
        x = int(round(10.0 * (1.0 - q) ** -0.5))
        for j in range(x):
            rows.append((i, eid, "e", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        [(u, e, t, float(e), 1.0) for (u, e, t, v) in rows],
        "user_id long, event_id long, event_type string, sec double, value double",
    ).select("user_id", "event_id", "event_type",
             F.timestamp_seconds("sec").alias("ts"), "value")
    out = activity_tail_index(ev, k=100).collect()[0]
    assert out["n_actors"] == n
    assert abs(out["alpha"] - 2.0) < 0.35  # quantile-grid Hill estimate
    assert 0 < out["top_share"] < 1
    assert out["xmin"] >= 10
