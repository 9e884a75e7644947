"""Batch-58 operators on hand-computed fixtures: snake-order shard
plan (operators/layout.py), finding-message template census
(operators/triples.py), price-vs-size curve (operators/stats.py)."""

from pyspark.sql import functions as F


# ------------------------------------------------------------- snake_shard_plan

def test_snake_plan_hand_computed(spark):
    from dr_source_spark.operators.layout import snake_shard_plan

    # revenues 80, 70, 30, 20 over 2 shards: snake order deals
    # rank0->shard0, rank1->shard1, rank2->shard1, rank3->shard0
    # -> shard0 = {80, 20} = 100, shard1 = {70, 30} = 100: perfectly fair
    rows = [(1, 80.0), (2, 70.0), (3, 30.0), (4, 20.0)]
    li = spark.createDataFrame(rows, "l_suppkey long, l_extendedprice double")
    out = {r["shard"]: r for r in snake_shard_plan(li, n_shards=2).collect()}
    assert (out[0]["n_suppliers"], out[0]["load_cents"]) == (2, 10000)
    assert (out[1]["load_cents"], out[1]["load_share_bp"]) == (10000, 5000)
    assert out[0]["vs_fair_bp"] == 10000 and out[1]["vs_fair_bp"] == 10000


def test_snake_plan_beats_round_robin_on_sorted_load(spark):
    from dr_source_spark.operators.layout import snake_shard_plan

    # strictly decreasing loads 8,7,6,5,4,3,2,1 on 2 shards:
    # round-robin would give 20 vs 16; snake gives 18 vs 18
    rows = [(i, float(9 - i)) for i in range(1, 9)]
    li = spark.createDataFrame(rows, "l_suppkey long, l_extendedprice double")
    out = {r["shard"]: r["load_cents"] for r in snake_shard_plan(li, n_shards=2).collect()}
    assert out[0] == out[1] == 1800


# ------------------------------------------------------------ message_templates

def test_message_templates_fold_digits(spark):
    from dr_source_spark.operators.triples import message_templates

    rows = [
        ("SQLI", "Sink 'executeQuery' called with tainted variable 'q17'"),
        ("SQLI", "Sink 'executeQuery' called with tainted variable 'q4033'"),
        ("SQLI", "Sink 'eval' called with tainted variable 'p9'"),
        ("SECRET", "(SEC-GENERIC-001) Generic high-entropy password."),
    ]
    df = spark.createDataFrame(rows, "vuln_type string, message string")
    out = {(r["vuln_type"], r["template"]): r["n_findings"]
           for r in message_templates(df).collect()}
    assert out[("SQLI", "Sink 'executeQuery' called with tainted variable 'q#'")] == 2
    assert out[("SQLI", "Sink 'eval' called with tainted variable 'p#'")] == 1
    # digits inside rule ids fold too — the template is a SHAPE
    assert out[("SECRET", "(SEC-GENERIC-#) Generic high-entropy password.")] == 1


# ------------------------------------------------------------- size_price_curve

def test_size_price_curve_hand_computed(spark):
    from dr_source_spark.operators.stats import size_price_curve

    rows = [
        (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0),   # size 10: median 2.00
        (4, 20, 5.0), (5, 20, 9.0),                 # size 20: lower median 5.00
        (6, 30, 7.0),                               # singleton
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_size long, p_retailprice double")
    out = {r["p_size"]: r for r in size_price_curve(df).collect()}
    assert (out[10]["n_parts"], out[10]["median_cents"]) == (3, 200)
    assert (out[20]["n_parts"], out[20]["median_cents"]) == (2, 500)
    assert (out[30]["n_parts"], out[30]["median_cents"]) == (1, 700)
