"""Batch-50 operators on hand-computed fixtures: embedding norm
extremes (training/similarity.py), overdue-customer churn screen
(operators/mining.py), per-brand quartile price dispersion
(operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------------- norm_extremes

def test_norm_extremes_hand_computed(spark):
    from dr_source_spark.training.similarity import norm_extremes

    # norms²·1e12: v0 = 0 (dead), v1 = 2, v2 = 8, v3 = 50 (exploding)
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [2.0, 2.0]),
        (3, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = norm_extremes(df, k=1).collect()
    by_side = {r["side"]: r for r in out}
    assert len(out) == 2
    assert (by_side["low"]["vec_id"], by_side["low"]["normsq"]) == (0, 0)
    assert (by_side["high"]["vec_id"], by_side["high"]["normsq"]) == (
        3, 50_000_000_000_000
    )
    assert by_side["low"]["n_dims"] == 2


def test_norm_extremes_tiebreak_and_overlap(spark):
    from dr_source_spark.training.similarity import norm_extremes

    # two equal-norm vectors: the tie on each side breaks by vec_id
    # asc; with n <= 2k both appear on both sides.
    rows = [(7, [1.0]), (5, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = norm_extremes(df, k=1).collect()
    assert {(r["side"], r["vec_id"]) for r in out} == {("low", 5), ("high", 5)}


# ----------------------------------------------------------- overdue_customers

def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )


def test_overdue_hand_computed(spark):
    from dr_source_spark.operators.mining import overdue_customers

    def d(day):
        return dt.datetime(2024, 1, day)

    rows = [
        # c1: orders on day 1, 11, 21 -> span 20, 2 gaps, mean 10;
        # last seen day 21, corpus clock = day 30 -> 9 days silent;
        # 9*2 = 18 <= 2*20 -> NOT overdue.
        (1, 1, 10.0, d(1)), (2, 1, 10.0, d(11)), (3, 1, 10.0, d(21)),
        # c2: days 1, 2, 3 -> span 2, mean 1; silent 27 days;
        # 27*2 = 54 > 2*2 -> overdue.
        (4, 2, 10.0, d(1)), (5, 2, 10.0, d(2)), (6, 2, 10.0, d(3)),
        # c3: two orders only -> excluded by min_orders=3; its day-30
        # order also sets the corpus clock.
        (7, 3, 10.0, d(29)), (8, 3, 10.0, d(30)),
    ]
    out = {r["o_custkey"]: r for r in overdue_customers(_orders(spark, rows)).collect()}
    assert set(out) == {1, 2}
    c1 = out[1]
    assert (c1["span_days"], c1["mean_gap_days"], c1["days_since_last"]) == (20, 10, 9)
    assert not c1["overdue"]
    c2 = out[2]
    assert (c2["span_days"], c2["mean_gap_days"], c2["days_since_last"]) == (2, 1, 27)
    assert c2["overdue"]


def test_overdue_boundary_not_strict(spark):
    from dr_source_spark.operators.mining import overdue_customers

    def d(day):
        return dt.datetime(2024, 1, day)

    # exactly factor x mean gap silent: days 1,3,5 (span 4, mean 2),
    # clock at day 9 -> silent 4 = 2*2 -> NOT overdue (strict >).
    rows = [
        (1, 1, 10.0, d(1)), (2, 1, 10.0, d(3)), (3, 1, 10.0, d(5)),
        (4, 2, 10.0, d(9)), (5, 2, 10.0, d(9)), (6, 2, 10.0, d(9)),
    ]
    out = {r["o_custkey"]: r for r in overdue_customers(_orders(spark, rows)).collect()}
    assert not out[1]["overdue"]
    # c2: span 0, silent 0 -> 0 > 0 false
    assert not out[2]["overdue"]


# ------------------------------------------------------- brand_price_dispersion

def test_brand_dispersion_hand_computed(spark):
    from dr_source_spark.operators.stats import brand_price_dispersion

    # brand A: cents 100..500 (n=5): ranks ((n-1)k) div 4 + 1 = 2,3,4
    # -> q1=200, med=300, q3=400, iqr=200, disp = 10^4*200 div 600 = 3333.
    a = [(i, "A", float(i)) for i in range(1, 6)]
    # brand B: single part -> all quartiles = itself, disp 0.
    b = [(10, "B", 7.0)]
    df = spark.createDataFrame(
        a + b, "p_partkey long, p_brand string, p_retailprice double"
    )
    out = {r["p_brand"]: r for r in brand_price_dispersion(df).collect()}
    A = out["A"]
    assert (A["n_parts"], A["q1_cents"], A["median_cents"], A["q3_cents"]) == (
        5, 200, 300, 400
    )
    assert (A["iqr_cents"], A["disp_bp"]) == (200, 3333)
    B = out["B"]
    assert (B["n_parts"], B["q1_cents"], B["q3_cents"], B["disp_bp"]) == (
        1, 700, 700, 0
    )
