"""Batch-49 operators on hand-computed fixtures: neighbor-Jaccard
top-k (operators/graph.py), Pareto-cut census and month-of-year
seasonality index (operators/stats.py)."""

import datetime as dt

from pyspark.sql import functions as F


# -------------------------------------------------------- neighbor_jaccard_topk

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_neighbor_jaccard_hand_computed(spark):
    from dr_source_spark.operators.graph import neighbor_jaccard_topk

    # square a-b-c-d-a: opposite corners (a,c) and (b,d) share BOTH
    # neighbors (jac = 2/2), adjacent pairs share none -> only the two
    # diagonals are scored, both at 10000 bp, non-adjacent.
    sq = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    rows = neighbor_jaccard_topk(sq, k=10).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("a", "c"), ("b", "d")]
    for r in rows:
        assert (r["inter_cnt"], r["deg_a"], r["deg_b"]) == (2, 2, 2)
        assert r["jac_bp"] == 10000 and not r["adjacent"]


def test_neighbor_jaccard_adjacent_and_partial(spark):
    from dr_source_spark.operators.graph import neighbor_jaccard_topk

    # triangle a-b-c plus pendant d on c: (a,b) adjacent sharing c ->
    # jac = 1/(2+2-1) = 3333 bp; (a,c): share b, deg 2+3 -> 2500 bp;
    # duplicate + reversed + self-loop edges must not change anything.
    g = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
         ("b", "a"), ("a", "b"), ("d", "d")],
    )
    rows = {(r["a"], r["b"]): r for r in neighbor_jaccard_topk(g, k=10).collect()}
    ab = rows[("a", "b")]
    assert (ab["inter_cnt"], ab["jac_bp"], ab["adjacent"]) == (1, 3333, True)
    ac = rows[("a", "c")]
    assert (ac["deg_a"], ac["deg_b"], ac["jac_bp"]) == (2, 3, 2500)
    # (b,d) share c: N(b)={a,c}, N(d)={c} -> 1/(2+1-1) = 5000,
    # non-adjacent (link candidate)
    bd = rows[("b", "d")]
    assert (bd["jac_bp"], bd["adjacent"]) == (5000, False)


def test_neighbor_jaccard_k_cut_deterministic(spark):
    from dr_source_spark.operators.graph import neighbor_jaccard_topk

    # square again: k=1 must keep (a,c) — tie on jac_bp broken by
    # (a asc, b asc).
    sq = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    rows = neighbor_jaccard_topk(sq, k=1).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("a", "c")]


# ------------------------------------------------------------------- pareto_cut

def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )


def test_pareto_cut_hand_computed(spark):
    from dr_source_spark.operators.stats import pareto_cut

    d = dt.datetime(2024, 1, 1)
    # revenues: c1=70, c2=20, c3=9, c4=1 (total 100). 80% target:
    # c1 (70) then c2 (90 >= 80) -> n_cover=2; c2 revenue split
    # across two orders to exercise the per-customer rollup.
    rows = [
        (1, 1, 70.0, d), (2, 2, 12.5, d), (3, 2, 7.5, d),
        (4, 3, 9.0, d), (5, 4, 1.0, d),
    ]
    r = pareto_cut(_orders(spark, rows)).collect()[0]
    assert (r["n_customers"], r["n_cover"]) == (4, 2)
    assert r["cover_share_bp"] == 5000
    assert r["total_cents"] == 10000


def test_pareto_cut_exact_boundary(spark):
    from dr_source_spark.operators.stats import pareto_cut

    d = dt.datetime(2024, 1, 1)
    # 5 equal customers: 80% is hit EXACTLY after 4 — the boundary
    # customer is included, the fifth is not.
    rows = [(i, i, 10.0, d) for i in range(1, 6)]
    r = pareto_cut(_orders(spark, rows)).collect()[0]
    assert (r["n_customers"], r["n_cover"], r["cover_share_bp"]) == (5, 4, 8000)


# ------------------------------------------------------------ month_seasonality

def test_month_seasonality_hand_computed(spark):
    from dr_source_spark.operators.stats import month_seasonality

    # Jan: 2 orders / $300; Feb: 1 order / $100. nm=2.
    # rev idx: Jan (10000*30000*2) div 40000 = 15000, Feb 5000.
    # cnt idx: Jan (10000*2*2) div 3 = 13333, Feb 6666.
    rows = [
        (1, 1, 100.0, dt.datetime(2024, 1, 5)),
        (2, 1, 200.0, dt.datetime(2023, 1, 20)),  # same month, other year
        (3, 2, 100.0, dt.datetime(2024, 2, 5)),
    ]
    df = _orders(spark, rows)
    out = {r["o_month"]: r for r in month_seasonality(df).collect()}
    assert set(out) == {1, 2}
    jan, feb = out[1], out[2]
    assert (jan["n_orders"], jan["rev_cents"]) == (2, 30000)
    assert (jan["rev_index_bp"], jan["cnt_index_bp"]) == (15000, 13333)
    assert (feb["rev_index_bp"], feb["cnt_index_bp"]) == (5000, 6666)
