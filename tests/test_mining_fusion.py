"""Association-rule mining (operators/mining.py), reciprocal-rank
fusion (training/search.py::rrf_fuse), and the modularity ledger
(operators/graph.py::modularity_by_community) on hand-computed
fixtures."""

from pyspark.sql import functions as F


def test_basket_rules_hand_computed(spark):
    from dr_source_spark.operators.mining import basket_rules

    # 4 baskets: {a,b} x3, {a,c} x1 → pair (a,b) in 3 baskets.
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
            (4, "a"), (4, "c"),
            (1, "a")]  # duplicate (basket, item) must dedupe
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.antecedent, r.consequent): r
        for r in basket_rules(df, "basket", "item",
                              min_item_support=1, min_pair_support=2).collect()
    }
    # (a,c) pair_n=1 < 2 → pruned; only a↔b survives
    assert set(out) == {("a", "b"), ("b", "a")}
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert ab.pair_n == 3 and ba.pair_n == 3
    # conf(a→b) = 3/4 = 7500 bp; conf(b→a) = 3/3 = 10000 bp
    assert ab.conf_bp == 7500 and ba.conf_bp == 10000
    # lift = pair_n·N/(n_a·n_b) = 3·4/(4·3) = 1.0 → 10000 bp, symmetric
    assert ab.lift_bp == 10000 and ba.lift_bp == 10000


def test_basket_rules_apriori_prune(spark):
    from dr_source_spark.operators.mining import basket_rules

    # item support floor removes 'b' (3 < 4) BEFORE pairing → no rules,
    # even though the (a,b) pair itself would clear min_pair_support
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "a")]
    df = spark.createDataFrame(rows, "basket long, item string")
    assert basket_rules(df, "basket", "item",
                        min_item_support=4, min_pair_support=2).count() == 0


def test_rrf_fuse_hand_computed(spark):
    from dr_source_spark.training.search import rrf_fuse

    r1 = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank long")
    r2 = spark.createDataFrame([(10, 1), (30, 2)], "doc_id long, rank long")
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=60, top=10).collect()}
    # doc 10: rank 1 in both lists → 2 · (10⁶ div 61) = 32786
    assert out[10].rrf_score == 2 * (1_000_000 // 61) and out[10].n_lists == 2
    # docs 20/30: rank 2 in one list only — absence costs nothing
    assert out[20].rrf_score == 1_000_000 // 62 and out[20].n_lists == 1
    assert out[30].rrf_score == 1_000_000 // 62


def test_rrf_fuse_top_cut_deterministic(spark):
    from dr_source_spark.training.search import rrf_fuse

    # ties on score break by doc_id ascending at the top cut
    r1 = spark.createDataFrame([(5, 1), (3, 1)], "doc_id long, rank long")
    rows = rrf_fuse([r1], k=60, top=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 3


def test_modularity_two_triangles(spark):
    from dr_source_spark.operators.graph import modularity_by_community

    # the classic two-triangles-and-a-bridge graph: m = 7; each
    # community has e_c = 3 internal edges and degree sum 7 →
    # q_num = 4·7·3 − 49 = 35 per side, Q = 70/196 ≈ 0.357
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 200)],
        "node long, label long",
    )
    out = {r.label: r for r in modularity_by_community(edges, labels).collect()}
    for lbl in (100, 200):
        assert out[lbl].n_nodes == 3
        assert out[lbl].internal_edges == 3
        assert out[lbl].degree_sum == 7
        assert out[lbl].q_num == 35
    # degree-sum law: Σ_c d_c = 2m when the partition covers all nodes
    assert sum(r.degree_sum for r in out.values()) == 2 * 7


def test_modularity_isolated_self_loop_node(spark):
    from dr_source_spark.operators.graph import modularity_by_community

    # a self-loop-only node has no simple-graph edges: degree 0,
    # 0 internal edges, q_num 0 — present but inert
    edges = spark.createDataFrame([(1, 2), (3, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "node long, label long"
    )
    out = {r.label: r for r in modularity_by_community(edges, labels).collect()}
    assert out[3].n_nodes == 1 and out[3].internal_edges == 0
    assert out[3].degree_sum == 0 and out[3].q_num == 0
    # the real edge's community: e=1, d=2, m=1 → q = 4·1·1 − 4 = 0
    assert out[1].q_num == 0
