"""Batch-40 operators on hand-computed fixtures: Kaplan-Meier life
table (operators/stats.life_table), Markov stationary distribution
(operators/relational.markov_stationary), and D'Hondt apportionment
(training/features.dhondt_allocate)."""

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


# ----------------------------------------------------------------- life_table

def _day(d):
    return dt.datetime(2024, 1, 1 + d, 12, 0, 0)


def test_life_table_hand_computed(spark):
    from dr_source_spark.operators.stats import life_table

    # Corpus max day = Jan 21 (day index 20). censor_days=7: censored
    # iff last event within <7 days of the max DAY, i.e. last day > Jan 14.
    # u1: days 0..2  -> duration 2,  last Jan 3  -> churn
    # u2: days 0..2  -> duration 2,  last Jan 3  -> churn
    # u3: days 0..5  -> duration 5,  last Jan 6  -> churn
    # u4: days 15..20 -> duration 5, last Jan 21 -> censored
    # u5: days 10..20 -> duration 10, last Jan 21 -> censored
    rows = []
    eid = 0
    for u, (a, b) in enumerate(
        [(0, 2), (0, 2), (0, 5), (15, 20), (10, 20)], start=1
    ):
        for d in (a, b):
            rows.append((eid, _day(d), u, "view"))
            eid += 1
    out = {
        r["duration_days"]: r
        for r in life_table(_ev(spark, rows), censor_days=7).collect()
    }
    # Grid: d=2 (risk 5, churn 2), d=5 (risk 3, churn 1, cens 1),
    # d=10 (risk 1, cens 1).
    assert sorted(out) == [2, 5, 10]
    assert (out[2]["n_risk"], out[2]["n_churn"], out[2]["n_censored"]) == (5, 2, 0)
    assert (out[5]["n_risk"], out[5]["n_churn"], out[5]["n_censored"]) == (3, 1, 1)
    assert (out[10]["n_risk"], out[10]["n_churn"], out[10]["n_censored"]) == (1, 0, 1)
    # Survival: 10^8 * 3//5 = 60000000; * 2//3 = 40000000; * 1//1 same.
    assert out[2]["s_x1e8"] == 60_000_000
    assert out[5]["s_x1e8"] == 40_000_000
    assert out[10]["s_x1e8"] == 40_000_000


def test_life_table_all_censored_survival_stays_full(spark):
    from dr_source_spark.operators.stats import life_table

    # Both users active at the boundary -> censored only, survival
    # never drops (no churn events).
    rows = [
        (0, _day(0), 1, "view"),
        (1, _day(3), 1, "view"),
        (2, _day(1), 2, "view"),
        (3, _day(3), 2, "view"),
    ]
    out = life_table(_ev(spark, rows), censor_days=7).collect()
    assert {r["duration_days"] for r in out} == {2, 3}
    assert all(r["s_x1e8"] == 10**8 for r in out)
    assert sum(r["n_churn"] for r in out) == 0


def test_life_table_truncation_is_sequential(spark):
    from dr_source_spark.operators.stats import life_table

    # 3 users churning at distinct durations (u4 pins the corpus max
    # far out so none of them is censored): the product must be the
    # SEQUENTIAL truncating recurrence, not an independent per-row
    # product. d=0: risk 4, censored 1 -> s stays 1e8 (censoring never
    # drops survival); d=1: risk 3, churn 1 -> 1e8*2//3 = 66666666
    # (truncated); d=2: s*1//2 = 33333333; d=3: *0//1 = 0.
    rows = []
    for u, (a, b) in enumerate([(0, 1), (0, 2), (0, 3)], start=1):
        rows.append((2 * u, _day(a), u, "x"))
        rows.append((2 * u + 1, _day(b), u, "x"))
    rows.append((99, _day(10), 9, "x"))  # duration 0, at the max -> censored
    out = {
        r["duration_days"]: r["s_x1e8"]
        for r in life_table(_ev(spark, rows), censor_days=1).collect()
    }
    assert out == {0: 10**8, 1: 66_666_666, 2: 33_333_333, 3: 0}


# ---------------------------------------------------------- markov_stationary

def test_markov_stationary_two_state_chain(spark):
    from dr_source_spark.operators.relational import markov_stationary

    # One user, stream a b a b a: transitions a->b (2), b->a (2).
    # Period-2 chain: uniform start is already stationary -> each
    # state holds scale/2 forever (exact, no truncation loss).
    rows = [
        (i, _day(i), 1, t) for i, t in enumerate(["a", "b", "a", "b", "a"])
    ]
    out = {
        r["event_type"]: r["pi_fp"]
        for r in markov_stationary(_ev(spark, rows), iterations=7).collect()
    }
    assert out == {"a": 5 * 10**11, "b": 5 * 10**11}


def test_markov_stationary_absorbing_state(spark):
    from dr_source_spark.operators.relational import markov_stationary

    # a->b, b->b: all mass drains into the absorbing b. After k
    # iterations pi(a) = scale/2 halved... no — a has a single
    # transition a->b (tot=1), so ALL of a's mass moves to b in one
    # step: pi1 = (0, scale). b's self-loop keeps it there.
    rows = [
        (0, _day(0), 1, "a"),
        (1, _day(1), 1, "b"),
        (2, _day(2), 1, "b"),
    ]
    out = {
        r["event_type"]: r["pi_fp"]
        for r in markov_stationary(_ev(spark, rows), iterations=3).collect()
    }
    assert out == {"a": 0, "b": 10**12}


def test_markov_stationary_terminal_type_gets_self_loop(spark):
    from dr_source_spark.operators.relational import markov_stationary

    # Single transition a->b; b never transitions (stream ends).
    # Without the pinned self-loop b's mass would vanish; with it,
    # b retains everything it receives: pi1 = (0, scale).
    rows = [(0, _day(0), 1, "a"), (1, _day(1), 1, "b")]
    out = {
        r["event_type"]: r["pi_fp"]
        for r in markov_stationary(_ev(spark, rows), iterations=5).collect()
    }
    assert out["a"] == 0
    assert out["b"] == 10**12


# ------------------------------------------------------------ dhondt_allocate

def test_dhondt_textbook_example(spark):
    from dr_source_spark.training.features import dhondt_allocate

    # Classic D'Hondt: votes A=100000, B=80000, C=30000, D=20000,
    # 8 seats -> A 4, B 3, C 1, D 0.
    df = spark.createDataFrame(
        [("A", 100000), ("B", 80000), ("C", 30000), ("D", 20000)],
        "party string, votes long",
    )
    out = {
        r["grp"]: r["seats"]
        for r in dhondt_allocate(df, "party", F.col("votes"), 8).collect()
    }
    assert out == {"A": 4, "B": 3, "C": 1, "D": 0}


def test_dhondt_seat_sum_law_and_zero_weight_row(spark):
    from dr_source_spark.training.features import dhondt_allocate

    df = spark.createDataFrame(
        [("a", 7), ("a", 6), ("b", 5), ("c", 0)],
        "grp string, w long",
    )
    out = dhondt_allocate(df, "grp", F.col("w"), 5).collect()
    seats = {r["grp"]: r["seats"] for r in out}
    assert sum(seats.values()) == 5
    # weights: a=13, b=5, c=0. Quotients: a: 13,6,4(13//3),3,2
    #   b: 5,2,1,1,1. Top5 = 13,6,5,4,3 -> a gets 4, b gets 1.
    assert seats == {"a": 4, "b": 1, "c": 0}
    assert {r["grp"]: r["weight"] for r in out} == {"a": 13, "b": 5, "c": 0}


def test_dhondt_truncated_quotient_tiebreak_pinned(spark):
    from dr_source_spark.training.features import dhondt_allocate

    # w_a=7, w_b=3, seats=2. Quotients: a: 7,3; b: 3,1.
    # a's i=2 quotient (7 div 2 = 3) TIES b's i=1 quotient (3) in
    # truncated arithmetic though 3.5 > 3 exactly; the pinned
    # tie-break (w desc) gives the contested 2nd seat to a.
    df = spark.createDataFrame([("a", 7), ("b", 3)], "grp string, w long")
    out = {
        r["grp"]: r["seats"]
        for r in dhondt_allocate(df, "grp", F.col("w"), 2).collect()
    }
    assert out == {"a": 2, "b": 0}
