"""Round-6 restructure gates: the structural-equivalence-class forms of
the co-neighbor graph operators and the set-class form of ppjoin must
reproduce the plain wedge / all-pairs references row for row, on graphs
and corpora with planted structural twins (so the compression path is
actually exercised) plus hubs and singletons."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from dr_source_spark.session import get_spark

    return get_spark(app_name="test_r06_cc", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="module")
def twin_graph(spark):
    # hub h0 touches everything; files f0..f9 split into two twin
    # classes (identical neighbor sets {h0,s1} / {h0,s2}); a chain
    # c1-c2-c3 for bridges; one isolated edge pair
    edges = []
    for i in range(10):
        edges.append((f"f{i}", "h0"))
        edges.append((f"f{i}", "s1" if i < 6 else "s2"))
    edges += [("c1", "c2"), ("c2", "c3"), ("x1", "x2")]
    return spark.createDataFrame(edges, "src string, dst string")


def _ref_wedge(edges, hub_cap=0):
    """plain node-level wedge: (node_a, node_b, n_common, deg_a, deg_b)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).union(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    wadj = adj
    if hub_cap:
        wadj = adj.join(
            deg.filter(F.col("d") <= hub_cap).select(F.col("node").alias("nb")), "nb"
        ).select("node", "nb")
    x, y = wadj.alias("x"), wadj.alias("y")
    inter = (
        x.join(y, (F.col("x.nb") == F.col("y.nb")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("node_a"), F.col("y.node").alias("node_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(deg.select(F.col("node").alias("node_a"), F.col("d").alias("deg_a")), "node_a")
        .join(deg.select(F.col("node").alias("node_b"), F.col("d").alias("deg_b")), "node_b"),
        und,
        deg,
    )


def test_neighbor_jaccard_matches_wedge_reference(spark, twin_graph):
    from dr_source_spark.operators.graph import neighbor_jaccard

    for kw, cap in [(dict(min_pct=50, min_common=2), 0),
                    (dict(min_pct=0, min_common=1), 0),
                    (dict(min_pct=30, min_common=1, max_hub_degree=5), 5),
                    (dict(min_pct=50, min_common=2, class_max_degree=1), 0)]:
        inter, _, _ = _ref_wedge(twin_graph, hub_cap=cap)
        ref = (
            inter.withColumn(
                "jaccard_pct",
                F.expr("CAST(100 * n_common AS BIGINT) div (deg_a + deg_b - n_common)"),
            )
            .filter(
                (F.col("n_common") >= kw["min_common"])
                & (F.col("jaccard_pct") >= kw["min_pct"])
            )
            .select(
                "node_a", "node_b",
                F.col("n_common").cast("long").alias("n_common"),
                F.col("deg_a").cast("long").alias("deg_a"),
                F.col("deg_b").cast("long").alias("deg_b"),
                F.col("jaccard_pct").cast("long").alias("jaccard_pct"),
            )
        )
        got = neighbor_jaccard(twin_graph, **kw)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect())), kw


def test_resource_allocation_matches_reference(spark, twin_graph):
    from dr_source_spark.operators.graph import resource_allocation

    for kw in [dict(min_common=1), dict(min_common=2, scale=777),
               dict(min_common=1, class_max_degree=1)]:
        scale = kw.get("scale", 10000)
        inter, und, deg = _ref_wedge(twin_graph)
        w = deg.select(F.col("node").alias("nb"), F.expr(f"cast({scale} div d as long)").alias("w"))
        adj = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).union(
            und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
        ).join(w, "nb")
        x, y = adj.alias("x"), adj.alias("y")
        ref = (
            x.join(y, (F.col("x.nb") == F.col("y.nb")) & (F.col("x.node") < F.col("y.node")))
            .groupBy(F.col("x.node").alias("node_a"), F.col("y.node").alias("node_b"))
            .agg(F.count("*").cast("long").alias("n_common"),
                 F.sum(F.col("x.w")).cast("long").alias("ra_score_scaled"))
            .filter(F.col("n_common") >= kw["min_common"])
        )
        ref = ref.join(und, (ref.node_a == und.a) & (ref.node_b == und.b), "left_anti")
        got = resource_allocation(twin_graph, **kw)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect())), kw


def test_local_bridges_matches_reference(spark, twin_graph):
    from dr_source_spark.operators.graph import local_bridges

    inter, und, deg = _ref_wedge(twin_graph)
    wedged = inter.select(F.col("node_a").alias("a"), F.col("node_b").alias("b"))
    ref = (
        und.join(wedged, ["a", "b"], "left_anti")
        .join(deg.select(F.col("node").alias("a"), F.col("d").cast("long").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").cast("long").alias("deg_b")), "b")
        .select("a", "b", "deg_a", "deg_b")
    )
    got = local_bridges(twin_graph)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # the chain's outer edges and the isolated edge are the bridges
    bridges = {(r["a"], r["b"]) for r in got.collect()}
    assert ("x1", "x2") in bridges and ("c1", "c2") in bridges


def test_neighbor_jaccard_topk_matches_reference(spark, twin_graph):
    from dr_source_spark.operators.graph import neighbor_jaccard_topk

    inter, und, _ = _ref_wedge(twin_graph)
    scored = (
        inter.join(und.withColumn("hit", F.lit(1)),
                   (inter.node_a == und.a) & (inter.node_b == und.b), "left")
        .select(
            F.col("node_a").alias("a"), F.col("node_b").alias("b"),
            F.col("n_common").cast("long").alias("inter_cnt"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            F.expr("CAST((10000 * n_common) div (deg_a + deg_b - n_common) AS BIGINT)").alias("jac_bp"),
            F.col("hit").isNotNull().alias("adjacent"),
        )
    )
    for k in (1, 3, 10, 1000):
        ref = scored.orderBy(F.desc("jac_bp"), F.asc("a"), F.asc("b")).limit(k).collect()
        got = neighbor_jaccard_topk(twin_graph, k=k).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in ref], k


def test_ppjoin_matches_allpairs_reference(spark):
    from dr_source_spark.training.dedup import ppjoin_pairs

    # planted twins (identical word sets), near-dups, disjoint docs
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),       # twin of 0
        (2, "delta gamma beta alpha alpha"), # same SET as 0 (order/dup noise)
        (3, "alpha beta gamma epsilon"),     # 3-of-5 overlap with 0
        (4, "zeta eta theta"),
        (5, "zeta eta theta iota"),
        (6, "unrelated words here"),
        (7, ""),                              # token-free: no pairs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    words = docs.select(
        "doc_id",
        F.array_distinct(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")).alias("ws"),
    ).filter(F.size("ws") > 0)
    a = words.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("wa"))
    b = words.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("wb"))
    isect = F.size(F.array_intersect("wa", "wb")).cast("long")
    for tau in (5000, 7500, 10000):
        ref = (
            a.crossJoin(b)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a", "doc_b",
                F.size("wa").cast("long").alias("n_a"),
                F.size("wb").cast("long").alias("n_b"),
                isect.alias("n_inter"),
            )
            .withColumn(
                "jaccard_bp",
                F.expr("(cast(n_inter as decimal(38,0)) * 10000) div (n_a + n_b - n_inter)").cast("long"),
            )
            .filter(F.col("jaccard_bp") >= tau)
        )
        got = ppjoin_pairs(docs, tau_bp=tau)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect())), tau
