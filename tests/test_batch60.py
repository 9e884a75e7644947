"""Batch-60 operators: dedup-method agreement census
(training/dedup.py) and account-balance histogram with the
floor-division pin (operators/stats.py)."""

from pyspark.sql import functions as F


# ---------------------------------------------------------- candidate_agreement

def test_agreement_statuses_partition_the_union(spark):
    from dr_source_spark.training.dedup import (
        candidate_agreement,
        minhash_lsh_candidates,
        oph_lsh_candidates,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (0, text), (1, text), (2, text + " extra tail words here now"),
        (3, "completely different text about other things entirely ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["status"]: r for r in candidate_agreement(docs).collect()}
    n_full = minhash_lsh_candidates(docs).count()
    n_oph = oph_lsh_candidates(docs).count()
    both = out.get("both", None)
    n_both = both["n_pairs"] if both else 0
    n_full_only = out.get("full_only", {"n_pairs": 0})
    n_fo = n_full_only["n_pairs"] if "full_only" in out else 0
    n_oo = out["oph_only"]["n_pairs"] if "oph_only" in out else 0
    # the three statuses partition the union of the two pair sets
    assert n_both + n_fo == n_full
    assert n_both + n_oo == n_oph
    assert sum(r["share_bp"] for r in out.values()) >= 9990
    # the exact-dup pair (0,1) must be found by BOTH methods
    assert n_both >= 1


# -------------------------------------------------------------- balance_buckets

def test_balance_buckets_floor_on_negatives(spark):
    from dr_source_spark.operators.stats import balance_buckets

    rows = [
        (1, 0.0),      # bucket 0
        (2, 499.99),   # bucket 0
        (3, 500.00),   # bucket 1
        (4, -0.01),    # bucket -1 (floor, NOT truncation-to-zero)
        (5, -500.00),  # exactly -1 boundary -> bucket -1
        (6, -500.01),  # bucket -2
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
    out = {r["bucket"]: r for r in balance_buckets(df).collect()}
    assert out[0]["n_customers"] == 2
    assert out[1]["n_customers"] == 1
    assert out[-1]["n_customers"] == 2
    assert out[-2]["n_customers"] == 1
    assert out[-1]["lo_cents"] == -50000
    assert sum(r["share_bp"] for r in out.values()) >= 9990
