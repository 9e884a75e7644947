"""Batch-53 operators on hand-computed fixtures: rich-club coefficient
(operators/graph.py), return-rate-by-lag (operators/stats.py), uniform
frame-sampling plan (training/multimodal.py)."""

import datetime as dt

from pyspark.sql import functions as F


# -------------------------------------------------------------------- rich_club

def test_rich_club_hand_computed(spark):
    from dr_source_spark.operators.graph import rich_club

    # K4 core {a,b,c,d} (6 edges) plus pendants e-a, f-b:
    # degrees: a=4, b=4, c=3, d=3, e=1, f=1.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("e", "a"), ("f", "b")],
        "src string, dst string",
    )
    out = {r["k"]: r for r in rich_club(edges, ks=(2, 4, 10)).collect()}
    # club of 2 = {a,b}: 1 edge among them -> density 10000
    assert (out[2]["n_club"], out[2]["n_club_edges"], out[2]["density_bp"]) == (2, 1, 10000)
    # club of 4 = {a,b,c,d}: the full K4 -> 6 edges, density 10000
    assert (out[4]["n_club_edges"], out[4]["density_bp"]) == (6, 10000)
    # club of 10 clamps to all 6 nodes: 8 edges / C(6,2)=15 -> 5333
    assert (out[10]["n_club"], out[10]["n_club_edges"], out[10]["density_bp"]) == (6, 8, 5333)


def test_rich_club_tiebreak_deterministic(spark):
    from dr_source_spark.operators.graph import rich_club

    # path x-y-z: deg y=2, x=z=1. k=2 club = {y, x} (tie x<z).
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z")], "src string, dst string"
    )
    r = {row["k"]: row for row in rich_club(edges, ks=(2,)).collect()}[2]
    # x-y edge inside the club -> 1 edge, density 10000
    assert (r["n_club"], r["n_club_edges"], r["density_bp"]) == (2, 1, 10000)


# ---------------------------------------------------------------- returns_by_lag

def test_returns_by_lag_hand_computed(spark):
    from dr_source_spark.operators.stats import returns_by_lag

    orders = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1))],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # lag 3 days -> week 0, returned
            (1, dt.datetime(2024, 1, 4), "R"),
            # lag 10 days -> week 1, kept
            (1, dt.datetime(2024, 1, 11), "N"),
            # lag 13 days -> week 1, returned
            (2, dt.datetime(2024, 1, 14), "R"),
            # lag 14 days -> week 2, kept
            (2, dt.datetime(2024, 1, 15), "A"),
        ],
        "l_orderkey long, l_shipdate timestamp, l_returnflag string",
    )
    out = {r["lag_weeks"]: r for r in returns_by_lag(li, orders).collect()}
    assert (out[0]["n_lines"], out[0]["n_returns"], out[0]["return_bp"]) == (1, 1, 10000)
    assert (out[1]["n_lines"], out[1]["n_returns"], out[1]["return_bp"]) == (2, 1, 5000)
    assert (out[2]["n_returns"], out[2]["return_bp"]) == (0, 0)


# ------------------------------------------------------------- frame_sample_plan

def test_frame_plan_hand_computed(spark):
    from dr_source_spark.training.multimodal import uniform_frame_plan

    rows = [
        (0, "x" * 350),   # 350 div 100 + 1 = 4 frames -> idx 0,1,2,3
        (1, "x" * 1000),  # 11 frames -> idx (j*10) div 3 = 0,3,6,10
        (2, ""),          # 1 frame -> all four samples hit frame 0
        (3, None),        # NULL text -> same as empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = uniform_frame_plan(df).collect()
    plan = {}
    for r in out:
        plan.setdefault(r["doc_id"], []).append((r["frame_j"], r["frame_idx"], r["n_frames"]))
    for k in plan:
        plan[k].sort()
    assert plan[0] == [(0, 0, 4), (1, 1, 4), (2, 2, 4), (3, 3, 4)]
    assert plan[1] == [(0, 0, 11), (1, 3, 11), (2, 6, 11), (3, 10, 11)]
    assert plan[2] == [(0, 0, 1), (1, 0, 1), (2, 0, 1), (3, 0, 1)]
    assert plan[3] == plan[2]
