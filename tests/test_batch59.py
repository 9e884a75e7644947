"""Batch-59 operators on hand-computed fixtures: per-dimension variance
ranking (training/similarity.py), event-type temporal burstiness and
purchase-rhythm histogram."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------- dim_variance_ranking

def test_dim_variance_hand_computed(spark):
    from dr_source_spark.training.similarity import dim_variance_ranking

    # dim 0 alternates full-scale (max variance); dim 1 constant at
    # the per-vector max -> quantizes to a constant -> variance 0.
    rows = [
        (0, [127.0, 127.0]),
        (1, [-127.0, 127.0]),
        (2, [127.0, 127.0]),
        (3, [-127.0, 127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in dim_variance_ranking(df).collect()}
    # dim0 q = ±127: s=0, sq=4·127² -> var_n2 = 4·4·16129 = 258064
    assert (out[0]["var_n2"], out[0]["rank"]) == (258064, 1)
    assert (out[1]["var_n2"], out[1]["rank"]) == (0, 2)


# -------------------------------------------------------------- type_burstiness

def test_burstiness_hand_computed(spark):
    from dr_source_spark.operators.stats import type_burstiness

    b = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'spiky': 6 events in hour 0, 1 in hour 1, 1 in hour 2 (total 8,
    # 3 active hours, max 6) -> burst = 10000*6*3 div 8 = 22500
    for m in range(6):
        rows.append((eid, b + dt.timedelta(minutes=m), "spiky")); eid += 1
    rows.append((eid, b + dt.timedelta(hours=1), "spiky")); eid += 1
    rows.append((eid, b + dt.timedelta(hours=2), "spiky")); eid += 1
    # 'flat': 2 events in each of 2 hours -> exactly 10000
    for h in (0, 0, 1, 1):
        rows.append((eid, b + dt.timedelta(hours=h, minutes=eid % 60), "flat")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["event_type"]: r for r in type_burstiness(df).collect()}
    s = out["spiky"]
    assert (s["n_events"], s["n_hours"], s["max_hour_events"], s["burst_bp"]) == (8, 3, 6, 22500)
    assert out["flat"]["burst_bp"] == 10000


# ---------------------------------------------------------------- gap_histogram

def test_gap_histogram_hand_computed(spark):
    from dr_source_spark.operators.mining import gap_histogram

    def d(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        # c1: days 0,14,28 -> span 28, 2 gaps -> mean 14 d = 2 weeks
        (1, 1, d(0)), (2, 1, d(14)), (3, 1, d(28)),
        # c2: days 0,5,10 -> mean 5 d -> 0 weeks (truncated)
        (4, 2, d(0)), (5, 2, d(5)), (6, 2, d(10)),
        # c3: only 2 orders -> excluded
        (7, 3, d(0)), (8, 3, d(50)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    out = {r["mean_gap_weeks"]: r for r in gap_histogram(df).collect()}
    assert (out[2]["n_customers"], out[2]["share_bp"]) == (1, 5000)
    assert (out[0]["n_customers"], out[0]["share_bp"]) == (1, 5000)
    assert set(out) == {0, 2}
