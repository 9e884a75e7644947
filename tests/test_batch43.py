"""Batch-43 operators on hand-computed fixtures: exact price indices
(operators/stats.price_index), Holt linear smoothing
(operators/stats.holt_linear), customer tier migration
(operators/mining.tier_migration)."""

import datetime as dt

from pyspark.sql import functions as F


# ---------------------------------------------------------------- price_index

def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "k string, period long, qty long, cents long"
    )


def test_price_index_hand_computed(spark):
    from dr_source_spark.operators.stats import price_index

    # Part A: p0 = 100 (2 units, 200c), p1 = 150 (1 unit, 150c).
    # Part B: p0 = 200 (1 unit), p1 = 100 (2 units, 200c).
    # L = 10000*(150*2 + 100*1) div (100*2 + 200*1) = 10000*400//400 = 10000
    # P = 10000*(150*1 + 100*2) div (100*1 + 200*2) = 3500000//500 = 7000
    # F = isqrt(10000*7000) = isqrt(70_000_000) = 8366
    rows = [
        ("A", 0, 2, 200), ("A", 1, 1, 150),
        ("B", 0, 1, 200), ("B", 1, 2, 200),
    ]
    r = price_index(
        _tx(spark, rows), "k", F.col("period"), F.col("qty"),
        F.col("cents"), 0, 1,
    ).collect()[0]
    assert (r["n_keys"], r["laspeyres_bp"], r["paasche_bp"], r["fisher_bp"]) == (
        2, 10000, 7000, 8366,
    )


def test_price_index_single_period_keys_excluded(spark):
    from dr_source_spark.operators.stats import price_index

    # C sells only in the base period, D only in current: both excluded,
    # leaving A with p0=100 -> p1=110: all three indices 11000.
    rows = [
        ("A", 0, 1, 100), ("A", 1, 1, 110),
        ("C", 0, 5, 500), ("D", 1, 5, 500),
    ]
    r = price_index(
        _tx(spark, rows), "k", F.col("period"), F.col("qty"),
        F.col("cents"), 0, 1,
    ).collect()[0]
    assert (r["n_keys"], r["laspeyres_bp"], r["paasche_bp"], r["fisher_bp"]) == (
        1, 11000, 11000, 11000,
    )


# ---------------------------------------------------------------- holt_linear

def _series(spark, vals, start_idx=0):
    return spark.createDataFrame(
        [(start_idx + i, v) for i, v in enumerate(vals)], "idx int, y long"
    )


def test_holt_exact_on_linear_series(spark):
    from dr_source_spark.operators.stats import holt_linear

    # y = 100 + 10t: after init l2=110, b2=10 the recurrence stays
    # exact: l_t = (y_t + l_{t-1} + b_{t-1}) div 2 = y_t, b_t = 10.
    out = {
        (r["kind"], r["month_id"]): r
        for r in holt_linear(_series(spark, [100, 110, 120, 130]), horizon=2).collect()
    }
    f3 = out[("fit", 3)]
    assert (f3["level_c"], f3["trend_c"], f3["yhat_c"]) == (130, 10, 130)
    # forecasts continue the line exactly
    assert out[("forecast", 4)]["yhat_c"] == 140
    assert out[("forecast", 5)]["yhat_c"] == 150
    assert out[("forecast", 4)]["y_cents"] is None


def test_holt_init_convention_pinned(spark):
    from dr_source_spark.operators.stats import holt_linear

    # l1=y1 (trend/yhat NULL), l2=y2, b2=y2-y1, yhat2 NULL,
    # t=3 first real step: y=[7, 3, 9]: l3=(9+3+(-4)) div 2 = 4,
    # b3=(3*(4-3)+7*(-4)) div 10 = -25 div 10 = -2 (TRUNCATED toward
    # zero, not floored -3), yhat3 = 3 + (-4) = -1.
    out = {r["month_id"]: r for r in holt_linear(_series(spark, [7, 3, 9]), horizon=1).collect() if r["kind"] == "fit"}
    assert out[0]["trend_c"] is None and out[0]["yhat_c"] is None
    assert (out[1]["level_c"], out[1]["trend_c"], out[1]["yhat_c"]) == (3, -4, None)
    assert (out[2]["level_c"], out[2]["trend_c"], out[2]["yhat_c"]) == (4, -2, -1)


# -------------------------------------------------------------- tier_migration

def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )


def _d(day):
    return dt.date(2024, 1, day)


def test_tier_migration_matrix(spark):
    from dr_source_spark.operators.mining import tier_migration

    # span Jan 1..Jan 11 -> split = Jan 1 + 5 = Jan 6; H1: d <= Jan 6.
    # H1 spends: u1=100, u2=200 (2 customers -> tiers: u1 rank1 ->
    # 1+(0*5) div 2 = 1; u2 rank2 -> 1+5 div 2 = 3).
    # H2 spends: u2=50, u3=300 -> u2 tier 1, u3 tier 3.
    # Flows: u1 (1 -> 0 churn), u2 (3 -> 1), u3 (0 -> 3 new).
    rows = [
        (1, _d(1), 1.00),
        (2, _d(2), 2.00),
        (2, _d(7), 0.50),
        (3, _d(11), 3.00),
    ]
    out = {
        (r["tier_from"], r["tier_to"]): (r["n_customers"], r["cents_to"])
        for r in tier_migration(_orders(spark, rows)).collect()
    }
    assert out == {(1, 0): (1, 0), (3, 1): (1, 50), (0, 3): (1, 300)}


def test_tier_migration_retention_diagonal(spark):
    from dr_source_spark.operators.mining import tier_migration

    # one customer active in both halves with equal spend -> single
    # (tier, tier) retention cell; a 1-customer half puts them in
    # tier 1 + 0 div 1 = 1... with n_bins=5 and nh=1: 1+(0*5) div 1 = 1.
    rows = [(1, _d(1), 5.00), (1, _d(11), 5.00)]
    out = tier_migration(_orders(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["tier_from"], r["tier_to"], r["n_customers"], r["cents_to"]) == (
        1, 1, 1, 500,
    )
