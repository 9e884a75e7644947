"""Batch-41 operators on hand-computed fixtures: community conductance
(operators/graph.conductance_by_label), U-shaped multi-touch attribution
(operators/relational.u_shape_attribution), Palma inequality ratio
(operators/stats.palma_ratio)."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------- conductance

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "node string, label string")


def test_conductance_two_triangles_one_bridge(spark):
    from dr_source_spark.operators.graph import conductance_by_label

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"),
         ("d", "f"), ("c", "d")],
    )
    lab = _labels(
        spark,
        [("a", "A"), ("b", "A"), ("c", "A"), ("d", "D"), ("e", "D"),
         ("f", "D")],
    )
    out = {r["label"]: r for r in conductance_by_label(e, lab).collect()}
    # vol(A)=2+2+3=7, vol(D)=7, tv=14, cut=1 each side ->
    # phi = 10000*1 div min(7,7) = 1428
    assert (out["A"]["n_nodes"], out["A"]["vol"], out["A"]["cut_edges"]) == (3, 7, 1)
    assert out["A"]["phi_bp"] == 1428
    assert out["D"]["phi_bp"] == 1428


def test_conductance_whole_graph_label_and_isolated_excluded(spark):
    from dr_source_spark.operators.graph import conductance_by_label

    # one triangle all in one label -> vol == total volume, excluded;
    # self-loop-only node g -> vol 0, excluded
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("g", "g")])
    lab = _labels(spark, [("a", "X"), ("b", "X"), ("c", "X"), ("g", "G")])
    assert conductance_by_label(e, lab).count() == 0


def test_conductance_duplicate_and_reversed_edges_collapse(spark):
    from dr_source_spark.operators.graph import conductance_by_label

    # a-b stated three ways is ONE undirected edge; labels differ ->
    # vol 1 each, cut 1, phi = 10000*1 div min(1,1) = 10000
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "b")])
    lab = _labels(spark, [("a", "L"), ("b", "R")])
    out = {r["label"]: r["phi_bp"] for r in conductance_by_label(e, lab).collect()}
    assert out == {"L": 10000, "R": 10000}


# ------------------------------------------------- u_shape_attribution

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1, 0, i, 0)


def test_u_attribution_four_touches(spark):
    from dr_source_spark.operators.relational import u_shape_attribution

    rows = [
        (0, _ts(0), 1, "click"),
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "error"),
        (4, _ts(4), 1, "purchase"),
    ]
    out = {r["event_type"]: r for r in u_shape_attribution(_ev(spark, rows)).collect()}
    # first click 4000, last error 4000, middles view/click 1000 each
    assert out["click"]["credit_bp"] == 5000
    assert out["view"]["credit_bp"] == 1000
    assert out["error"]["credit_bp"] == 4000
    assert sum(r["credit_bp"] for r in out.values()) == 10000
    assert out["click"]["n_touches"] == 2
    assert out["click"]["n_conversions"] == 1


def test_u_attribution_remainder_to_earliest_middle(spark):
    from dr_source_spark.operators.relational import u_shape_attribution

    # 5 touches a..e: middles b,c,d split 2000 div 3 = 666 with the
    # 2000 % 3 = 2 remainder pinned to b -> 668/666/666; sum law holds.
    rows = [(i, _ts(i), 1, t) for i, t in enumerate("abcde")] + [
        (9, _ts(9), 1, "purchase")
    ]
    out = {r["event_type"]: r["credit_bp"] for r in u_shape_attribution(_ev(spark, rows)).collect()}
    assert out == {"a": 4000, "b": 668, "c": 666, "d": 666, "e": 4000}


def test_u_attribution_journeys_and_empty_journey(spark):
    from dr_source_spark.operators.relational import u_shape_attribution

    # user 1: purchase with NO prior touches (credits nothing), then
    # one click -> purchase (journey of one touch: all 10000).
    # user 2: touches with no closing purchase -> nothing credited.
    rows = [
        (0, _ts(0), 1, "purchase"),
        (1, _ts(1), 1, "click"),
        (2, _ts(2), 1, "purchase"),
        (3, _ts(0), 2, "view"),
        (4, _ts(1), 2, "click"),
    ]
    out = {r["event_type"]: r for r in u_shape_attribution(_ev(spark, rows)).collect()}
    assert set(out) == {"click"}
    assert out["click"]["credit_bp"] == 10000
    assert out["click"]["n_conversions"] == 1


def test_u_attribution_two_touches_split_evenly(spark):
    from dr_source_spark.operators.relational import u_shape_attribution

    rows = [
        (0, _ts(0), 1, "view"),
        (1, _ts(1), 1, "click"),
        (2, _ts(2), 1, "purchase"),
    ]
    out = {r["event_type"]: r["credit_bp"] for r in u_shape_attribution(_ev(spark, rows)).collect()}
    assert out == {"view": 5000, "click": 5000}


# ------------------------------------------------------------ palma_ratio

def test_palma_uniform_decade(spark):
    from dr_source_spark.operators.stats import palma_ratio

    # keys 1..10 with values 1..10: top_k=1 (value 10), bottom_k=4
    # (values 1..4 sum 10) -> palma exactly 10000 bp.
    df = spark.createDataFrame(
        [(k, k) for k in range(1, 11)], "k long, v long"
    )
    r = palma_ratio(df, "k", F.col("v")).collect()[0]
    assert (r["n_keys"], r["top_k"], r["bottom_k"]) == (10, 1, 4)
    assert (r["top_sum"], r["bottom_sum"], r["palma_bp"]) == (10, 10, 10000)


def test_palma_bottom_zero_gives_null(spark):
    from dr_source_spark.operators.stats import palma_ratio

    df = spark.createDataFrame(
        [(1, 5)] + [(k, 0) for k in range(2, 11)], "k long, v long"
    )
    r = palma_ratio(df, "k", F.col("v")).collect()[0]
    assert r["bottom_sum"] == 0
    assert r["palma_bp"] is None


def test_palma_aggregates_multiple_rows_per_key(spark):
    from dr_source_spark.operators.stats import palma_ratio

    # 10 keys; key 10 assembled from three fact rows (6+2+2).
    rows = [(k, k) for k in range(1, 10)] + [(10, 6), (10, 2), (10, 2)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = palma_ratio(df, "k", F.col("v")).collect()[0]
    assert (r["top_sum"], r["bottom_sum"], r["palma_bp"]) == (10, 10, 10000)
