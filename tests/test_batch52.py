"""Batch-52 operators on hand-computed fixtures: taint-trace depth
census (operators/triples.py), day-of-week × hour heatmap and
discount-policy audit (operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ----------------------------------------------------------- trace_depth_census

def test_trace_depth_hand_computed(spark):
    from dr_source_spark.operators.triples import trace_depth_census

    rows = [
        ("SQLI", ["hop1", "hop2"]),
        ("SQLI", ["hop1"]),
        ("SQLI", ["hop1", "hop2"]),
        ("SECRET", []),          # regex tier: empty trace -> 0 hops
        ("SECRET", None),        # NULL trace must also land in 0, not -1
    ]
    df = spark.createDataFrame(rows, "vuln_type string, trace array<string>")
    out = {(r["vuln_type"], r["n_hops"]): r["n_findings"]
           for r in trace_depth_census(df).collect()}
    assert out == {("SQLI", 2): 2, ("SQLI", 1): 1, ("SECRET", 0): 2}


# -------------------------------------------------------------- dow_hour_census

def test_dow_hour_hand_computed(spark):
    from dr_source_spark.operators.stats import dow_hour_census

    # 2024-01-01 is a Monday -> dow 0; 2024-01-07 a Sunday -> dow 6.
    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 5)),
        (2, dt.datetime(2024, 1, 1, 9, 59)),
        (3, dt.datetime(2024, 1, 1, 23, 0)),
        (4, dt.datetime(2024, 1, 7, 9, 30)),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {(r["dow"], r["hour"]): r for r in dow_hour_census(df).collect()}
    assert out[(0, 9)]["n_events"] == 2
    assert out[(0, 9)]["share_bp"] == 5000
    assert out[(0, 23)]["share_bp"] == 2500
    assert out[(6, 9)]["n_events"] == 1


# --------------------------------------------------------------- discount_audit

def test_discount_audit_hand_computed(spark):
    from dr_source_spark.operators.stats import discount_audit

    rows = [
        # 10% tier: 100.00 and 50.00 gross -> 15000 gross_cents,
        # discount 1000 + 500 = 1500 -> giveback exactly 1000 bp
        (100.0, 0.10), (50.0, 0.10),
        # 0% tier: no giveback
        (80.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "l_extendedprice double, l_discount double")
    out = {r["disc_pct"]: r for r in discount_audit(df).collect()}
    t10 = out[10]
    assert (t10["n_lines"], t10["gross_cents"], t10["discount_cents"]) == (2, 15000, 1500)
    assert t10["giveback_bp"] == 1000
    t0 = out[0]
    assert (t0["gross_cents"], t0["discount_cents"], t0["giveback_bp"]) == (8000, 0, 0)
