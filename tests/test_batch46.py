"""Batch-46 forensics operators (operators/forensics.py) on
hand-computed fixtures: near-duplicate payments (band join),
structuring census, round-number bias."""

import datetime as dt

from pyspark.sql import functions as F


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double"
    )


def _d(m, day):
    return dt.date(2024, m, day)


# ------------------------------------------------- near_duplicate_payments

def test_double_charge_pair_found_once(spark):
    from dr_source_spark.operators.forensics import near_duplicate_payments

    rows = [
        (1, 7, _d(1, 1), 100.00),
        (2, 7, _d(1, 15), 100.50),   # within $1 and 14 days -> pair
        (3, 7, _d(1, 16), 300.00),   # amount far -> no pair
        (4, 8, _d(1, 1), 100.00),    # other customer -> no pair with 1
    ]
    out = near_duplicate_payments(
        _orders(spark, rows), amount_tol_c=100, day_window=90
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["okey_a"], r["okey_b"], r["diff_c"], r["day_gap"]) == (1, 2, 50, 14)


def test_double_charge_cross_bucket_and_window(spark):
    from dr_source_spark.operators.forensics import near_duplicate_payments

    # cents 199 vs 201 straddle the tol=100 bucket boundary (1 vs 2):
    # the +/-1 bucket explode must still find them. A third order at
    # the same amount but 91 days away is outside the window.
    rows = [
        (1, 5, _d(1, 1), 1.99),
        (2, 5, _d(1, 2), 2.01),
        (3, 5, _d(4, 1), 2.01),  # 91 days after okey 1, 90 after okey 2
    ]
    out = near_duplicate_payments(
        _orders(spark, rows), amount_tol_c=100, day_window=90
    ).collect()
    got = {(r["okey_a"], r["okey_b"]) for r in out}
    assert (1, 2) in got
    assert (1, 3) not in got
    assert (2, 3) in got  # 90 days exactly -> inside
    assert len(out) == 2  # and each pair exactly once


# ------------------------------------------------------- structuring_census

def test_structuring_hand_computed(spark):
    from dr_source_spark.operators.forensics import structuring_census

    # threshold $100 (10000c). cust 1 week of Jan 1-7 (Mon 2024-01-01):
    # 60 + 50 = 110 >= 100, each < 100 -> flagged.
    # cust 2: single 90 -> not flagged (n < 2).
    # cust 3: 60 + 150 -> the 150 is over-threshold, drops out; the
    # remaining single 60 fails n >= 2.
    rows = [
        (1, 1, _d(1, 2), 60.00),
        (2, 1, _d(1, 3), 50.00),
        (3, 2, _d(1, 2), 90.00),
        (4, 3, _d(1, 2), 60.00),
        (5, 3, _d(1, 3), 150.00),
    ]
    out = structuring_census(_orders(spark, rows), threshold_c=10000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["o_custkey"], r["n_orders"], r["total_cents"]) == (1, 2, 11000)
    assert r["week_start"] == _d(1, 1)  # ISO Monday


def test_structuring_week_boundary_splits(spark):
    from dr_source_spark.operators.forensics import structuring_census

    # Sunday Jan 7 and Monday Jan 8 are different ISO weeks: the two
    # 60s never aggregate -> no flag.
    rows = [(1, 1, _d(1, 7), 60.00), (2, 1, _d(1, 8), 60.00)]
    assert structuring_census(_orders(spark, rows), threshold_c=10000).count() == 0


# -------------------------------------------------------- round_number_bias

def test_round_bias_hand_computed(spark):
    from dr_source_spark.operators.forensics import round_number_bias

    li = spark.createDataFrame(
        [
            (5.0, 10.00),   # round qty, whole-dollar price
            (7.0, 10.50),
            (10.0, 3.33),   # round qty
            (11.0, 7.77),
        ],
        "l_quantity double, l_extendedprice double",
    )
    out = {r["metric"]: r for r in round_number_bias(li).collect()}
    q = out["qty_mult_of_5"]
    assert (q["n"], q["n_hits"], q["share_bp"], q["excess_bp"]) == (4, 2, 5000, 3000)
    p = out["whole_dollar_price"]
    assert (p["n_hits"], p["share_bp"], p["expected_bp"], p["excess_bp"]) == (
        1, 2500, 100, 2400,
    )
