"""Batch-48 operators on hand-computed fixtures: PCA explained-variance
ratio (training/similarity.pca_explained_ratio), dual-sourcing risk and
bot-cadence regularity (operators/relational.py)."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------- pca_explained_ratio

def test_pca_explained_one_direction(spark):
    from dr_source_spark.training.similarity import pca_explained_ratio

    # all variance on dim 0 (dim 1 constant): the top component
    # explains everything -> explained_bp ~ 10000 (truncation may land
    # a hair under).
    rows = [
        (0, [127.0, 64.0]),
        (1, [-127.0, 64.0]),
        (2, [127.0, 64.0]),
        (3, [-127.0, 64.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = pca_explained_ratio(df).collect()[0]
    assert r["n_dims"] == 2
    assert 9990 <= r["explained_bp"] <= 10000
    # receipt columns are exact digit strings
    assert r["trace"].lstrip("-").isdigit() and r["xx"].isdigit()


def test_pca_explained_isotropic_half(spark):
    from dr_source_spark.training.similarity import pca_explained_ratio

    # two orthogonal equal-variance directions: the top component can
    # only claim ~half the trace.
    rows = [
        (0, [127.0, 0.0]),
        (1, [-127.0, 0.0]),
        (2, [0.0, 127.0]),
        (3, [0.0, -127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = pca_explained_ratio(df).collect()[0]
    assert 4000 <= r["explained_bp"] <= 6000


# ------------------------------------------------------------- dual_source_risk

def test_dual_source_risk_hand_computed(spark):
    from dr_source_spark.operators.relational import dual_source_risk

    li = spark.createDataFrame(
        [
            (1, 10), (1, 10), (1, 20),   # part 1: suppliers {10, 20}
            (2, 10),                     # part 2: single supplier
            (3, 30),                     # part 3: single supplier
        ],
        "l_partkey long, l_suppkey long",
    )
    sup = spark.createDataFrame(
        [(10, 100), (20, 200), (30, 100)],
        "s_suppkey long, s_nationkey long",
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B1"), (3, "B2")], "p_partkey long, p_brand string"
    )
    out = {r["p_brand"]: r for r in dual_source_risk(li, sup, part).collect()}
    b1 = out["B1"]
    # B1: part1 dual (2 suppliers, 2 nations), part2 single ->
    # 1 of 2 single-sourced = 5000 bp
    assert (b1["n_parts"], b1["n_single_supplier"], b1["single_supplier_bp"]) == (2, 1, 5000)
    assert (b1["n_single_nation"], b1["single_nation_bp"]) == (1, 5000)
    b2 = out["B2"]
    assert (b2["n_parts"], b2["single_supplier_bp"]) == (1, 10000)


def test_dual_source_multi_supplier_same_nation(spark):
    from dr_source_spark.operators.relational import dual_source_risk

    # two suppliers but SAME nation: supplier-diverse yet
    # nation-concentrated — the two columns must disagree.
    li = spark.createDataFrame(
        [(1, 10), (1, 30)], "l_partkey long, l_suppkey long"
    )
    sup = spark.createDataFrame(
        [(10, 100), (30, 100)], "s_suppkey long, s_nationkey long"
    )
    part = spark.createDataFrame([(1, "B")], "p_partkey long, p_brand string")
    r = dual_source_risk(li, sup, part).collect()[0]
    assert (r["n_single_supplier"], r["n_single_nation"]) == (0, 1)


# ---------------------------------------------------------- cadence_regularity

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_cadence_bot_vs_human(spark):
    from dr_source_spark.operators.relational import cadence_regularity

    base = dt.datetime(2024, 1, 1)
    rows = []
    # bot: exactly 60 s apart -> CV² = 0
    for i in range(5):
        rows.append((i, base + dt.timedelta(seconds=60 * i), 1, "x"))
    # human: irregular gaps 10, 100, 40 s
    for j, off in enumerate([0, 10, 110, 150]):
        rows.append((100 + j, base + dt.timedelta(seconds=off), 2, "x"))
    out = {r["user_id"]: r for r in cadence_regularity(_ev(spark, rows)).collect()}
    bot = out[1]
    assert (bot["n_gaps"], bot["mean_gap_us"], bot["cv2_x1e8"]) == (4, 60_000_000, 0)
    assert bot["bot_like"]
    hum = out[2]
    # gaps us: 1e7, 1e8, 4e7; n=3, sg=1.5e8, sgg=1.17e16
    # cv2 = 1e8*(3*1.17e16 - 2.25e16) div 2.25e16 = 1e8*1.26e16//2.25e16 = 56000000
    assert hum["cv2_x1e8"] == 56_000_000
    assert not hum["bot_like"]


def test_cadence_min_gaps_excludes_short_streams(spark):
    from dr_source_spark.operators.relational import cadence_regularity

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "x"),
        (1, base + dt.timedelta(seconds=5), 1, "x"),
        (2, base + dt.timedelta(seconds=9), 1, "x"),  # only 2 gaps
    ]
    assert cadence_regularity(_ev(spark, rows)).count() == 0
