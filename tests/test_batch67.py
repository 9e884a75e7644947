"""Batch-67 operators: simhash-vs-jaccard geometry agreement
(training/dedup.py) and weekly-active-users trend
(operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ---------------------------------------------------- simhash_jaccard_agreement

def test_geometry_agreement_partitions_union(spark):
    from dr_source_spark.training.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard,
        simhash_jaccard_agreement,
        simhash_near_dup_pairs,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (0, text), (1, text), (2, text + " extra tail words here now"),
        (3, "a wholly different document about entirely other topics here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["status"]: r["n_pairs"] for r in simhash_jaccard_agreement(docs).collect()}
    n_sh = simhash_near_dup_pairs(docs).count()
    n_jc = (
        ngram_jaccard(docs, minhash_lsh_candidates(docs))
        .filter(F.col("jaccard") >= 0.9).count()
    )
    both = out.get("both", 0)
    assert both + out.get("simhash_only", 0) == n_sh
    assert both + out.get("jaccard_only", 0) == n_jc
    # the exact-dup pair agrees under BOTH geometries
    assert both >= 1


# --------------------------------------------------------------- weekly_actives

def test_weekly_actives_hand_computed(spark):
    from dr_source_spark.operators.stats import weekly_actives

    # 2024-01-01 (Mon) is ISO week 1 of 2024; 2023-12-31 (Sun) belongs
    # to ISO week 52 of 2023 — the ISO-year pin keeps them separate.
    rows = [
        (0, dt.datetime(2024, 1, 1, 10), 1),
        (1, dt.datetime(2024, 1, 2, 11), 1),   # same user, same week
        (2, dt.datetime(2024, 1, 3, 12), 2),
        (3, dt.datetime(2023, 12, 31, 9), 1),  # ISO 2023-W52
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {(r["iso_year"], r["iso_week"]): r for r in weekly_actives(df).collect()}
    w1 = out[(2024, 1)]
    assert (w1["n_active"], w1["n_events"], w1["events_per_active_x1000"]) == (2, 3, 1500)
    assert out[(2023, 52)]["n_active"] == 1
