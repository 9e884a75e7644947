"""Batch-71 operators on hand-computed fixtures: weekend-vs-weekday
order profile (operators/stats.py) and canonical-representative
quality audit (training/dedup.py)."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------------- weekend_effect

def test_weekend_effect_hand_computed(spark):
    from dr_source_spark.operators.stats import weekend_effect

    rows = [
        # 2024-01-06 Sat, 2024-01-07 Sun, 2024-01-08 Mon
        (1, 100.0, dt.datetime(2024, 1, 6)),
        (2, 50.0, dt.datetime(2024, 1, 7)),
        (3, 250.0, dt.datetime(2024, 1, 8)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = {r["is_weekend"]: r for r in weekend_effect(df).collect()}
    we = out[True]
    assert (we["n_orders"], we["rev_cents"], we["order_share_bp"]) == (2, 15000, 6666)
    assert (we["rev_share_bp"], we["avg_order_cents"]) == (3750, 7500)
    wd = out[False]
    assert (wd["n_orders"], wd["rev_share_bp"]) == (1, 6250)


# ------------------------------------------------------------------ rep_quality

def test_rep_quality_hand_computed(spark):
    from dr_source_spark.training.dedup import rep_quality

    rows = [
        # family 1: doc 0 (rep) has extra whitespace -> LONGER than
        # doc 1; rep carries the max length
        (0, "hello  world"),
        (1, "hello world"),
        # family 2: doc 2 (rep) is the SHORT one; doc 3's double space
        # makes it 1 char longer -> rep not longest, 1 char lost
        (2, "foo bar"),
        (3, "FOO  BAR"),
        # singleton: excluded
        (4, "unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = rep_quality(df).collect()[0]
    assert r["n_families"] == 2
    assert r["n_rep_is_longest"] == 1
    assert r["rep_longest_bp"] == 5000
    # family 2: max_len = len("FOO  BAR") = 8, rep len = 7 -> 1 lost;
    # family 1 loses 0 (rep IS the longest)
    assert r["total_len_lost"] == 1
