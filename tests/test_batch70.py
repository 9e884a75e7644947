"""Batch-70 operators on hand-computed fixtures: first-order-value vs
lifetime quartile matrix (operators/mining.py) and brand-exclusivity
histogram (operators/relational.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------ first_value_matrix

def test_first_value_matrix_hand_computed(spark):
    from dr_source_spark.operators.mining import first_value_matrix

    def d(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        # c1: first 10.00, lifetime 10.00
        (1, 1, 10.0, d(0)),
        # c2: first 20.00 (same-day tie broken by orderkey: 2 < 3),
        # lifetime 50.00
        (2, 2, 20.0, d(0)), (3, 2, 30.0, d(0)),
        # c3: first 40.00, lifetime 40.00
        (4, 3, 40.0, d(1)),
        # c4: first 5.00, lifetime 105.00
        (5, 4, 5.0, d(0)), (6, 4, 100.0, d(2)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )
    out = {(r["first_q"], r["lifetime_q"]): r
           for r in first_value_matrix(df).collect()}
    # first values: c4=500, c1=1000, c2=2000, c3=4000 -> quartiles 1..4
    # lifetimes:    c1=1000, c3=4000, c2=5000, c4=10500 -> quartiles 1..4
    # cells: c1 (2,1), c2 (3,3), c3 (4,2), c4 (1,4)
    assert out[(2, 1)]["n_customers"] == 1
    assert out[(3, 3)]["n_customers"] == 1
    assert out[(4, 2)]["n_customers"] == 1
    assert out[(1, 4)]["n_customers"] == 1
    assert all(r["share_bp"] == 2500 for r in out.values())


# ------------------------------------------------------ brand_supplier_histogram

def test_brand_histogram_hand_computed(spark):
    from dr_source_spark.operators.relational import brand_supplier_histogram

    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (3, 30)],
        "l_partkey long, l_suppkey long",
    )
    part = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "p_partkey long, p_brand string"
    )
    out = {r["n_suppliers_per_brand"]: r
           for r in brand_supplier_histogram(li, part).collect()}
    # brand A: suppliers {10, 20}; brand B: {30}
    assert (out[2]["n_brands"], out[2]["share_bp"]) == (1, 5000)
    assert (out[1]["n_brands"], out[1]["share_bp"]) == (1, 5000)
