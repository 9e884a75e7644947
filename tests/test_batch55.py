"""Batch-55 operators on hand-computed fixtures: LSH bucket-balance
audit (training/similarity.py), per-nation trade balance
(operators/relational.py)."""

from pyspark.sql import functions as F


# ------------------------------------------------------------ lsh_bucket_balance

def test_bucket_balance_mass_sums_and_counts(spark):
    from dr_source_spark.training.similarity import (
        lsh_bucket_balance,
        multitable_signatures,
    )

    rows = [(i, [float((i * 7 + d) % 13 - 6) for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_bucket_balance(df, num_tables=3, planes_per_table=2, dim=8).collect()
    # invariants: Σ size·n_buckets = 20 vectors × 3 tables; mass sums to
    # ~10000 (truncation may shave a few bp); histogram matches a direct
    # recount of the same production signatures
    total = sum(r["bucket_size"] * r["n_buckets"] for r in out)
    assert total == 60
    assert 9990 <= sum(r["mass_bp"] for r in out) <= 10000
    sigs = multitable_signatures(df, num_tables=3, planes_per_table=2, dim=8)
    sizes = (
        sigs.groupBy("tbl", "bucket").count().groupBy("count").count().collect()
    )
    expect = {r["count"]: r["count(1)"] if "count(1)" in r else r[1] for r in sizes}
    got = {r["bucket_size"]: r["n_buckets"] for r in out}
    assert got == {int(k): int(v) for k, v in expect.items()}


def test_bucket_balance_uniform_fixture(spark):
    from dr_source_spark.training.similarity import lsh_bucket_balance

    # two vectors opposed on dim 0 only, 1 table / 1 plane: the ±1
    # plane projects them to ±p₀ — opposite signs whatever the plane —
    # so one lands each side: two buckets of size 1
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_bucket_balance(df, num_tables=1, planes_per_table=1, dim=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket_size"], r["n_buckets"], r["mass_bp"]) == (1, 2, 10000)


# ---------------------------------------------------------------- trade_balance

def test_trade_balance_hand_computed(spark):
    from dr_source_spark.operators.relational import trade_balance

    li = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 50.0), (2, 10, 25.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    )
    orders = spark.createDataFrame(
        [(1, 7), (2, 8)], "o_orderkey long, o_custkey long"
    )
    customer = spark.createDataFrame(
        [(7, 100), (8, 200)], "c_custkey long, c_nationkey long"
    )
    supplier = spark.createDataFrame(
        [(10, 100), (20, 200)], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(100, "ALPHA"), (200, "BETA")], "n_nationkey long, n_name string"
    )
    out = {r["n_name"]: r for r in
           trade_balance(li, orders, customer, supplier, nation).collect()}
    a = out["ALPHA"]
    # supplies 100+25=125.00, buys order1 = 150.00 -> deficit -25.00
    assert (a["supp_rev_cents"], a["cust_rev_cents"]) == (12500, 15000)
    assert a["balance_cents"] == -2500
    assert a["supp_to_cust_bp"] == 8333
    b = out["BETA"]
    # supplies 50.00, buys order2 = 25.00 -> surplus
    assert (b["supp_rev_cents"], b["cust_rev_cents"], b["balance_cents"]) == (5000, 2500, 2500)
    assert b["supp_to_cust_bp"] == 20000
