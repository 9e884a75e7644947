"""Batch-44 operators on hand-computed fixtures: hub-removal
robustness census (operators/graph.hub_removal_impact), economic order
quantity (operators/stats.eoq_by_key), systematic sampling
(training/features.systematic_sample)."""

from pyspark.sql import functions as F


# -------------------------------------------------------- hub_removal_impact

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_hub_removal_star_shatters(spark):
    from dr_source_spark.operators.graph import hub_removal_impact

    # star: hub h connected to 6 leaves; removing the single top hub
    # (k=1) leaves no edges at all -> empty 'after' census.
    e = _edges(spark, [("h", f"l{i}") for i in range(6)])
    out = {r["phase"]: r for r in hub_removal_impact(e, k=1).collect()}
    assert (out["before"]["n_nodes"], out["before"]["n_components"],
            out["before"]["giant_size"]) == (7, 1, 7)
    assert (out["after"]["n_nodes"], out["after"]["n_components"],
            out["after"]["giant_size"]) == (0, 0, None)


def test_hub_removal_mesh_survives(spark):
    from dr_source_spark.operators.graph import hub_removal_impact

    # 4-cycle a-b-c-d-a plus chord a-c: a and c have degree 3 -> top-2
    # hubs (tie d=3: a, c by node asc... both are the only deg-3).
    # Removing a and c leaves edges among {b, d}: none (b-d not an
    # edge) -> after census is empty; before is one 4-node component.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")])
    out = {r["phase"]: r for r in hub_removal_impact(e, k=2).collect()}
    assert (out["before"]["n_nodes"], out["before"]["n_components"],
            out["before"]["giant_size"]) == (4, 1, 4)
    assert out["after"]["n_nodes"] == 0

    # k=1 removes only 'a' (deg tie a=c=3, node asc): left edges
    # b-c, c-d -> one 3-node chain.
    out1 = {r["phase"]: r for r in hub_removal_impact(e, k=1).collect()}
    assert (out1["after"]["n_nodes"], out1["after"]["n_components"],
            out1["after"]["giant_size"]) == (3, 1, 3)


def test_hub_removal_two_components_giant(spark):
    from dr_source_spark.operators.graph import hub_removal_impact

    # triangle x-y-z plus pair p-q: before: 2 components, giant 3.
    # top-1 hub = x (deg 2, tie x<y<z): after edges y-z, p-q ->
    # 2 components of 2, giant 2.
    e = _edges(spark, [("x", "y"), ("y", "z"), ("x", "z"), ("p", "q")])
    out = {r["phase"]: r for r in hub_removal_impact(e, k=1).collect()}
    assert (out["before"]["n_components"], out["before"]["giant_size"]) == (2, 3)
    assert (out["after"]["n_nodes"], out["after"]["n_components"],
            out["after"]["giant_size"]) == (4, 2, 2)


# ------------------------------------------------------------------ eoq_by_key

def test_eoq_hand_computed(spark):
    from dr_source_spark.operators.stats import eoq_by_key

    # D=100, S=5000, H=200: rad = 1_000_000 div 200 = 5000 -> isqrt 70
    # (70^2=4900 <= 5000 < 71^2=5041); n_orders = ceil(100/70) = 2.
    df = spark.createDataFrame([("p1", 60), ("p1", 40)], "k string, q long")
    r = eoq_by_key(df, "k", F.col("q")).collect()[0]
    assert (r["demand_qty"], r["eoq_units"], r["n_orders"]) == (100, 70, 2)


def test_eoq_zero_demand_excluded_and_clamp(spark):
    from dr_source_spark.operators.stats import eoq_by_key

    # p0 nets to zero -> excluded. p2: D=1, S=1, H=5000:
    # rad = 2 div 5000 = 0 -> isqrt 0 -> clamped to 1; n_orders = 1.
    df = spark.createDataFrame(
        [("p0", 5), ("p0", -5), ("p2", 1)], "k string, q long"
    )
    out = {
        r["k"]: r
        for r in eoq_by_key(df, "k", F.col("q"), order_cost_c=1,
                            holding_c=5000).collect()
    }
    assert set(out) == {"p2"}
    assert (out["p2"]["eoq_units"], out["p2"]["n_orders"]) == (1, 1)


# ------------------------------------------------------------ systematic_sample

def test_systematic_sample_counts_and_determinism(spark):
    from dr_source_spark.training.features import systematic_sample

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    s1 = systematic_sample(df, "doc_id", 10).collect()
    s2 = systematic_sample(df, "doc_id", 10).collect()
    assert len(s1) == 10  # ceil(100/10)
    assert sorted(r["sample_rank"] for r in s1) == [1 + 10 * i for i in range(10)]
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)


def test_systematic_sample_ceiling_and_order(spark):
    import hashlib

    from dr_source_spark.training.features import systematic_sample

    # 7 ids, stride 3 -> ranks 1, 4, 7 = 3 rows; the selected ids are
    # exactly positions 0, 3, 6 of the (md5-prefix, id) order computed
    # independently in Python.
    ids = list(range(20, 27))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    order = sorted(
        ids, key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i)
    )
    expect = {order[0], order[3], order[6]}
    got = {r["doc_id"] for r in systematic_sample(df, "doc_id", 3).collect()}
    assert got == expect
