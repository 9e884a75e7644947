"""Batch-66 operators on hand-computed fixtures: priority fulfillment
speed (operators/stats.py), repo risk-concentration Gini
(operators/triples.py), uppercase-shouting screen (training/text.py)."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------------- priority_speed

def test_priority_speed_hand_computed(spark):
    from dr_source_spark.operators.stats import priority_speed

    orders = spark.createDataFrame(
        [(1, 9, dt.datetime(2024, 1, 1), "1-URGENT"),
         (2, 9, dt.datetime(2024, 1, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3)), (1, dt.datetime(2024, 1, 8)),
         (2, dt.datetime(2024, 1, 31))],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {r["o_orderpriority"]: r for r in priority_speed(li, orders).collect()}
    u = out["1-URGENT"]
    # lags 2 and 7 -> mean 4 (9 div 2), max 7
    assert (u["n_lines"], u["mean_lag_days"], u["max_lag_days"]) == (2, 4, 7)
    assert (out["5-LOW"]["mean_lag_days"], out["5-LOW"]["max_lag_days"]) == (30, 30)


# ----------------------------------------------------------- repo_concentration

def test_repo_gini_hand_computed(spark):
    from dr_source_spark.operators.triples import repo_concentration

    # repo A: 1 finding, repo B: 9 -> Gini of [1,9] = 0.4 -> 4000 bp
    rows = [("A", "x")] + [("B", "x")] * 9
    df = spark.createDataFrame(rows, "repo string, vuln_type string")
    r = repo_concentration(df).collect()[0]
    assert (r["n_repos"], r["total_findings"], r["gini_bp"]) == (2, 10, 4000)


def test_repo_gini_equal_is_zero(spark):
    from dr_source_spark.operators.triples import repo_concentration

    rows = [("A", "x")] * 3 + [("B", "x")] * 3 + [("C", "x")] * 3
    df = spark.createDataFrame(rows, "repo string, vuln_type string")
    assert repo_concentration(df).collect()[0]["gini_bp"] == 0


# ----------------------------------------------------------------- shout_screen

def test_shout_screen_letters_only_denominator(spark):
    from dr_source_spark.training.text import shout_screen

    rows = [
        (0, "en", "BUY NOW LIMITED OFFER"),          # all caps -> flagged
        (1, "en", "A normal sentence with One Cap"),  # not flagged
        # digits don't dilute: '1234567890 OK' is 100% upper among letters
        (2, "en", "1234567890 OK"),
        (3, "en", None),                              # no letters -> not flagged
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = shout_screen(df).collect()[0]
    assert (r["n_docs"], r["n_shouting"], r["flagged_bp"]) == (4, 2, 5000)
