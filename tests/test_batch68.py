"""Batch-68 operators on hand-computed fixtures: sink-API census
(operators/triples.py), p_type vocabulary decomposition
(operators/stats.py), spend-volatility screen (operators/mining.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------------ sink_census

def test_sink_census_excludes_regex_tier(spark):
    from dr_source_spark.operators.triples import sink_census

    rows = [
        ("SQLI", "executeQuery"), ("SQLI", "executeQuery"),
        ("CMDI", "eval"),
        ("SECRET", None),  # regex-tier: no sink -> excluded
    ]
    df = spark.createDataFrame(rows, "vuln_type string, sink string")
    out = {r["sink"]: r for r in sink_census(df).collect()}
    assert set(out) == {"executeQuery", "eval"}
    eq = out["executeQuery"]
    assert (eq["n_findings"], eq["n_vuln_types"], eq["share_bp"]) == (2, 1, 6666)
    assert out["eval"]["share_bp"] == 3333


# -------------------------------------------------------------- type_vocabulary

def test_type_vocabulary_positions(spark):
    from dr_source_spark.operators.stats import type_vocabulary

    df = spark.createDataFrame(
        [(1, "STANDARD POLISHED BRASS"), (2, "STANDARD BURNISHED TIN"),
         (3, "LARGE POLISHED BRASS")],
        "p_partkey long, p_type string",
    )
    out = {(r["pos"], r["token"]): r for r in type_vocabulary(df).collect()}
    assert out[(0, "STANDARD")]["n_parts"] == 2
    assert out[(0, "STANDARD")]["pos_share_bp"] == 6666
    assert out[(1, "POLISHED")]["pos_share_bp"] == 6666
    assert out[(2, "BRASS")]["n_parts"] == 2
    assert out[(2, "TIN")]["pos_share_bp"] == 3333


# ------------------------------------------------------------- spend_volatility

def test_spend_volatility_hand_computed(spark):
    from dr_source_spark.operators.mining import spend_volatility

    d = dt.datetime(2024, 1, 1)
    rows = [
        # c1: constant 100.00 x3 -> CV² = 0, subscription-like
        (1, 1, 100.0, d), (2, 1, 100.0, d), (3, 1, 100.0, d),
        # c2: 10.00, 10.00, 1000.00 -> erratic
        (4, 2, 10.0, d), (5, 2, 10.0, d), (6, 2, 1000.0, d),
        # c3: 2 orders -> excluded
        (7, 3, 50.0, d), (8, 3, 60.0, d),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )
    out = {r["o_custkey"]: r for r in spend_volatility(df).collect()}
    assert set(out) == {1, 2}
    c1 = out[1]
    assert (c1["mean_cents"], c1["cv2_x1e8"], c1["volatile"]) == (10000, 0, False)
    c2 = out[2]
    # cents 1000,1000,100000: sc=102000, scc=1e16+2e6... exact:
    # scc = 2*1e6 + 1e10 = 10002000000; n*scc - sc² = 3*10002000000 - 10404000000
    # = 19602000000; cv2 = 1e8*19602000000 div 10404000000 = 188408304
    assert c2["cv2_x1e8"] == 188408304
    assert c2["volatile"]
