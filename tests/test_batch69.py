"""Batch-69 operators on hand-computed fixtures: CWE mix over HAS_VULN
edges (operators/triples.py) and per-segment balance dispersion with
the sign-boundary guard (operators/stats.py)."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------------- cwe_mix

def test_cwe_mix_counts_files_once(spark):
    from dr_source_spark.operators.triples import cwe_mix

    rows = [
        ("f1", "HAS_VULN", "CWE-89"),
        ("f1", "HAS_VULN", "CWE-89"),   # duplicate tagging collapses
        ("f2", "HAS_VULN", "CWE-89"),
        ("f3", "HAS_VULN", "CWE-78"),
        ("f1#var:q", "FLOWS_TO", "sink@L7"),  # non-HAS_VULN ignored
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r["cwe"]: r for r in cwe_mix(df).collect()}
    assert (out["CWE-89"]["n_files"], out["CWE-89"]["share_bp"]) == (2, 6666)
    assert (out["CWE-78"]["n_files"], out["CWE-78"]["share_bp"]) == (1, 3333)


# --------------------------------------------------- segment_balance_dispersion

def test_segment_dispersion_negative_guard(spark):
    from dr_source_spark.operators.stats import segment_balance_dispersion

    # lower-nearest ranks at n=3: q1 -> rank 1, median & q3 -> rank 2
    # (((n-1)k) div 4 + 1 = 1, 2, 2)
    rows = [
        # AUTO: balances -3, -1, 1 -> q1=-300, med=q3=-100:
        # q3+q1 = -400 <= 0 -> disp NULL
        (1, "AUTO", -3.0), (2, "AUTO", -1.0), (3, "AUTO", 1.0),
        # RETAIL: 1, 2, 3 -> q1=100, q3=200 -> disp 10^4*100 div 300 = 3333
        (4, "RETAIL", 1.0), (5, "RETAIL", 2.0), (6, "RETAIL", 3.0),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_mktsegment string, c_acctbal double")
    out = {r["c_mktsegment"]: r for r in segment_balance_dispersion(df).collect()}
    a = out["AUTO"]
    assert (a["q1_cents"], a["median_cents"], a["q3_cents"]) == (-300, -100, -100)
    assert a["iqr_cents"] == 200 and a["disp_bp"] is None
    r = out["RETAIL"]
    assert (r["q1_cents"], r["q3_cents"], r["disp_bp"]) == (100, 200, 3333)
