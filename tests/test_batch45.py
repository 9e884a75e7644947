"""Batch-45 operators on hand-computed fixtures: max-min fair
water-filling allocation (training/features.waterfill_allocate), local
bridges (operators/graph.local_bridges), supplier scorecard
(operators/relational.supplier_scorecard)."""

from pyspark.sql import functions as F


# ---------------------------------------------------------- waterfill_allocate

def _avail(spark, rows):
    return spark.createDataFrame(rows, "grp string, a long")


def test_waterfill_hand_computed(spark):
    from dr_source_spark.training.features import waterfill_allocate

    # avail a=2, b=5, c=10; budget 9. L: sum(min(avail,L)):
    # L=2 -> 2+2+2=6 <= 9; L=3 -> 2+3+3=8 <= 9; L=4 -> 2+4+4=10 > 9.
    # So L=3, spent 8, leftover 1 -> first unsaturated by key (b).
    out = {
        r["grp"]: (r["avail"], r["alloc"])
        for r in waterfill_allocate(
            _avail(spark, [("a", 2), ("b", 5), ("c", 10)]), "grp", F.col("a"), 9
        ).collect()
    }
    assert out == {"a": (2, 2), "b": (5, 4), "c": (10, 3)}


def test_waterfill_budget_exceeds_availability(spark):
    from dr_source_spark.training.features import waterfill_allocate

    out = {
        r["grp"]: r["alloc"]
        for r in waterfill_allocate(
            _avail(spark, [("a", 3), ("b", 4)]), "grp", F.col("a"), 100
        ).collect()
    }
    assert out == {"a": 3, "b": 4}


def test_waterfill_laws_on_skewed_fixture(spark):
    from dr_source_spark.training.features import waterfill_allocate

    # one dominant group: proportional methods would hand it nearly
    # everything; max-min gives every small group its full need first.
    rows = [("big", 1000)] + [(f"s{i}", 3) for i in range(10)]
    out = waterfill_allocate(_avail(spark, rows), "grp", F.col("a"), 100).collect()
    alloc = {r["grp"]: r["alloc"] for r in out}
    assert sum(alloc.values()) == 100  # sum law (budget < total avail)
    assert all(a <= dict(rows)[g] for g, a in alloc.items())  # cap law
    assert all(alloc[f"s{i}"] == 3 for i in range(10))  # small fully served
    assert alloc["big"] == 70


def test_waterfill_unsaturated_spread_at_most_one(spark):
    from dr_source_spark.training.features import waterfill_allocate

    # 3 unsaturated groups, budget not divisible: allocs differ <= 1
    # and the +1s go to the first keys ascending.
    out = {
        r["grp"]: r["alloc"]
        for r in waterfill_allocate(
            _avail(spark, [("x", 50), ("y", 50), ("z", 50)]), "grp", F.col("a"), 10
        ).collect()
    }
    assert out == {"x": 4, "y": 3, "z": 3}


# ---------------------------------------------------------------- local_bridges

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_local_bridges_barbell(spark):
    from dr_source_spark.operators.graph import local_bridges

    # two triangles joined by the bridge c-d: every triangle edge has
    # a common neighbor; c-d has none.
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"),
         ("d", "f"), ("c", "d")],
    )
    out = local_bridges(e).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["deg_a"], r["deg_b"]) == ("c", "d", 3, 3)


def test_local_bridges_triangle_has_none_path_all(spark):
    from dr_source_spark.operators.graph import local_bridges

    # triangle: zero bridges; 3-node path: both edges are bridges
    tri = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert local_bridges(tri).count() == 0
    path = _edges(spark, [("a", "b"), ("b", "c")])
    got = {(r["a"], r["b"]) for r in local_bridges(path).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_local_bridges_duplicate_reversed_edges(spark):
    from dr_source_spark.operators.graph import local_bridges

    # a-b stated twice reversed is still the single bridge a-b
    e = _edges(spark, [("a", "b"), ("b", "a")])
    out = local_bridges(e).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"], out[0]["deg_a"], out[0]["deg_b"]) == (
        "a", "b", 1, 1,
    )


# ----------------------------------------------------------- supplier_scorecard

def test_supplier_scorecard_hand_computed(spark):
    import datetime as dt

    from dr_source_spark.operators.relational import supplier_scorecard

    li = spark.createDataFrame(
        [
            # s1: 3 lines, 1 late (lag 61 > 60), 1 return, revenue 600c
            (100, 1, 1.00, dt.date(2024, 3, 2), "R"),   # lag 61 -> late
            (100, 1, 2.00, dt.date(2024, 3, 1), "N"),   # lag 60 -> on time
            (101, 1, 3.00, dt.date(2024, 1, 10), "N"),
            # s2: 1 line, on time, no return, revenue 1000c
            (101, 2, 10.00, dt.date(2024, 1, 5), "N"),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_shipdate date, l_returnflag string",
    )
    orders = spark.createDataFrame(
        [(100, dt.date(2024, 1, 1)), (101, dt.date(2024, 1, 1))],
        "o_orderkey long, o_orderdate date",
    )
    sup = spark.createDataFrame(
        [(1, "Alpha"), (2, "Beta")], "s_suppkey long, s_name string"
    )
    out = {
        r["s_suppkey"]: r
        for r in supplier_scorecard(li, orders, sup).collect()
    }
    s1 = out[1]
    assert (s1["n_lines"], s1["revenue_cents"]) == (3, 600)
    assert s1["late_bp"] == 3333  # 1 of 3 late, truncated
    assert s1["return_bp"] == 3333
    assert s1["rev_rank"] == 2
    s2 = out[2]
    assert (s2["late_bp"], s2["return_bp"], s2["rev_rank"]) == (0, 0, 1)
