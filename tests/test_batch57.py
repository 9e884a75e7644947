"""Batch-57 operators on hand-computed fixtures: market-segment
profile (operators/relational.py), tax-tier audit and hot-key skew
census (operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# -------------------------------------------------------------- segment_profile

def test_segment_profile_hand_computed(spark):
    from dr_source_spark.operators.relational import segment_profile

    orders = spark.createDataFrame(
        [(1, 7, 100.0), (2, 7, 50.0), (3, 8, 150.0), (4, 9, 100.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(7, "AUTO"), (8, "AUTO"), (9, "RETAIL")],
        "c_custkey long, c_mktsegment string",
    )
    out = {r["c_mktsegment"]: r for r in segment_profile(orders, customer).collect()}
    auto = out["AUTO"]
    assert (auto["n_customers"], auto["n_orders"], auto["revenue_cents"]) == (2, 3, 30000)
    assert auto["revenue_share_bp"] == 7500
    assert auto["avg_order_cents"] == 10000
    assert out["RETAIL"]["revenue_share_bp"] == 2500


# -------------------------------------------------------------------- tax_audit

def test_tax_audit_hand_computed(spark):
    from dr_source_spark.operators.stats import tax_audit

    rows = [
        # 8% tier on a 10%-discounted 100.00 line: base 90.00,
        # gross 97.20 -> tax 7.20 -> effective exactly 800 bp
        (100.0, 0.10, 0.08),
        # 0% tier
        (50.0, 0.0, 0.0),
    ]
    li = spark.createDataFrame(
        rows, "l_extendedprice double, l_discount double, l_tax double"
    )
    out = {r["tax_pct"]: r for r in tax_audit(li).collect()}
    t8 = out[8]
    assert (t8["base_cents"], t8["tax_cents"], t8["effective_bp"]) == (9000, 720, 800)
    t0 = out[0]
    assert (t0["base_cents"], t0["tax_cents"], t0["effective_bp"]) == (5000, 0, 0)


# -------------------------------------------------------------- key_skew_census

def test_key_skew_hand_computed(spark):
    from dr_source_spark.operators.stats import key_skew_census

    rows = []
    eid = 0
    for uid, n in [(1, 5), (2, 3), (3, 1), (4, 1)]:
        for _ in range(n):
            rows.append((eid, uid))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    out = {r["rank"]: r for r in key_skew_census(ev, k=3).collect()}
    assert len(out) == 3
    r1 = out[1]
    assert (r1["user_id"], r1["n_events"], r1["share_bp"], r1["cum_share_bp"]) == (1, 5, 5000, 5000)
    r2 = out[2]
    assert (r2["user_id"], r2["share_bp"], r2["cum_share_bp"]) == (2, 3000, 8000)
    # rank 3 tiebreak: users 3 and 4 both have 1 event -> user 3 wins
    assert (out[3]["user_id"], out[3]["cum_share_bp"]) == (3, 9000)
