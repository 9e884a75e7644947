"""Batch-61 operators on hand-computed fixtures: triple-shape census
(operators/triples.py), year-over-year growth and quantity-mix profile
(operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ---------------------------------------------------------------- subject_kinds

def test_subject_kinds_hand_computed(spark):
    from dr_source_spark.operators.triples import subject_kinds

    rows = [
        ("repo:a.py@c", "HAS_VULN", "CWE-89"),
        ("repo:a.py@c#var:q7", "TAINTED_BY", "src"),
        ("repo:a.py@c#var:q7", "FLOWS_TO", "sink@L7"),
        ("repo:b.ini@c#L2", "MATCHES_RULE", "SEC-1"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {(r["subj_kind"], r["pred"]): r for r in subject_kinds(df).collect()}
    assert out[("file", "HAS_VULN")]["n_triples"] == 1
    assert out[("variable", "TAINTED_BY")]["share_bp"] == 2500
    assert out[("line", "MATCHES_RULE")]["n_triples"] == 1
    # a '#L2' mid-string (not suffix) must NOT classify as line
    df2 = spark.createDataFrame(
        [("repo:x#L2weird@c", "P", "o")], "subj string, pred string, obj string"
    )
    assert subject_kinds(df2).collect()[0]["subj_kind"] == "file"


# ------------------------------------------------------------------ year_growth

def test_year_growth_signed_truncation(spark):
    from dr_source_spark.operators.stats import year_growth

    rows = [
        (1, 100.0, dt.datetime(2020, 3, 1)),
        (2, 150.0, dt.datetime(2021, 6, 1)),   # +50% -> 5000 bp
        (3, 100.0, dt.datetime(2022, 1, 1)),   # -33.34% -> -3333 (toward zero)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = {r["o_year"]: r for r in year_growth(df).collect()}
    assert out[2020]["yoy_bp"] is None
    assert out[2021]["yoy_bp"] == 5000
    assert out[2022]["yoy_bp"] == -3333


# ------------------------------------------------------------- quantity_profile

def test_quantity_profile_share_divergence(spark):
    from dr_source_spark.operators.stats import quantity_profile

    rows = [
        # qty 1: 3 cheap lines; qty 10: 1 expensive line
        (1.0, 10.0), (1.0, 10.0), (1.0, 10.0), (10.0, 970.0),
    ]
    df = spark.createDataFrame(rows, "l_quantity double, l_extendedprice double")
    out = {r["qty"]: r for r in quantity_profile(df).collect()}
    q1 = out[1]
    # 3/4 of lines but 3% of revenue — the q17 shape
    assert (q1["line_share_bp"], q1["rev_share_bp"]) == (7500, 300)
    q10 = out[10]
    assert (q10["line_share_bp"], q10["rev_share_bp"]) == (2500, 9700)
