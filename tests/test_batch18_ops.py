"""Planted-truth tests for the batch-18 operators: metapath census
(all three 2-hop shapes), directed reciprocity, pivot eccentricity /
closeness profile, and term burstiness."""

import pytest

from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


class TestMetapathCensus:
    def test_chain_closed_form(self, spark):
        from dr_source_spark.operators.graph import metapath_census

        # a -p-> m, m -q-> c, m -q-> d: exactly two (p, q) chains through m
        e = _edges(spark, [("a", "p", "m"), ("m", "q", "c"), ("m", "q", "d")])
        out = {
            (r["pred_a"], r["pred_b"]): (r["n_paths"], r["n_mid_nodes"])
            for r in metapath_census(e, shape="chain").collect()
        }
        assert out == {("p", "q"): (2, 1)}

    def test_chain_empty_on_bipartite(self, spark):
        from dr_source_spark.operators.graph import metapath_census

        # strictly bipartite: no node is both a dst and a src
        e = _edges(spark, [("a", "p", "x"), ("b", "q", "y")])
        assert metapath_census(e, shape="chain").count() == 0

    def test_co_subject_cross_and_within(self, spark):
        from dr_source_spark.operators.graph import metapath_census

        # node m: 2 p-edges + 1 q-edge -> (p,p): C(2,2)=1, (p,q): 2*1=2
        # node n: 1 p-edge only -> contributes nothing (singleton pred
        # count gives C(1,2)=0, filtered out of (p,p)'s node set too? no:
        # n_mid_nodes counts nodes contributing to the PAIR rows; n's
        # (p,p) row has np=0 so it is excluded only from n_paths, not the
        # join — assert the exact semantics: the census keeps the node in
        # the distinct-mid count for pairs it appears in.
        e = _edges(
            spark,
            [
                ("m", "p", "x"),
                ("m", "p", "y"),
                ("m", "q", "z"),
                ("n", "p", "w"),
            ],
        )
        out = {
            (r["pred_a"], r["pred_b"]): (r["n_paths"], r["n_mid_nodes"])
            for r in metapath_census(e, shape="co_subject").collect()
        }
        # (p,p): only m has >= 2 p-edges -> 1 pair; mid-node count spans
        # both m and n (n joins with np=0), but the HAVING-style filter
        # drops only all-zero predicate pairs, not mixed ones
        assert out[("p", "p")] == (1, 2)
        assert out[("p", "q")] == (2, 1)
        assert ("q", "q") not in out  # single q-edge -> zero pairs, dropped

    def test_co_object_shape(self, spark):
        from dr_source_spark.operators.graph import metapath_census

        # two files sharing a CWE target under the same predicate
        e = _edges(spark, [("f1", "HAS", "cwe"), ("f2", "HAS", "cwe")])
        out = metapath_census(e, shape="co_object").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["pred_a"], r["pred_b"], r["n_paths"], r["n_mid_nodes"]) == (
            "HAS",
            "HAS",
            1,
            1,
        )

    def test_unknown_shape_raises(self, spark):
        from dr_source_spark.operators.graph import metapath_census

        e = _edges(spark, [("a", "p", "b")])
        with pytest.raises(ValueError):
            metapath_census(e, shape="zigzag")


class TestReciprocity:
    def test_mixed_graph(self, spark):
        from dr_source_spark.operators.graph import reciprocity

        # a<->b mutual, a->c one-way, c->c self-loop (dropped),
        # duplicate a->b (dropped by distinct)
        e = _edges(
            spark,
            [
                ("a", "p", "b"),
                ("b", "p", "a"),
                ("a", "p", "c"),
                ("c", "p", "c"),
                ("a", "q", "b"),  # same directed edge, other pred: still (a,b)
            ],
        )
        r = reciprocity(e).collect()[0]
        assert r["n_edges"] == 3  # (a,b), (b,a), (a,c)
        assert r["n_pairs"] == 2  # {a,b}, {a,c}
        assert r["n_mutual_pairs"] == 1
        assert r["reciprocity_bp"] == 10000 * 2 * 1 // 3

    def test_no_mutual(self, spark):
        from dr_source_spark.operators.graph import reciprocity

        e = _edges(spark, [("a", "p", "b"), ("b", "p", "c")])
        r = reciprocity(e).collect()[0]
        assert r["n_mutual_pairs"] == 0 and r["reciprocity_bp"] == 0


class TestEccentricityProfile:
    def test_path_graph(self, spark):
        from dr_source_spark.operators.graph import eccentricity_profile

        # path a-b-c-d-e (undirected): degrees b,c,d = 2; a,e = 1.
        # pivots (top-4 by degree, node asc): b, c, d, a.
        e = _edges(
            spark,
            [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "e")],
        )
        out = {
            r["pivot_node"]: r
            for r in eccentricity_profile(e, n_pivots=4, max_hops=8).collect()
        }
        assert set(out) == {"a", "b", "c", "d"}
        # c is the center: distances 0,1,1,2,2 -> ecc 2, sum 6,
        # closeness_bp = 10000*4 div 6
        assert out["c"]["ecc"] == 2
        assert out["c"]["n_reached"] == 5
        assert out["c"]["sum_hops"] == 6
        assert out["c"]["closeness_bp"] == 10000 * 4 // 6
        # a is an end: distances 0..4 -> ecc 4 (diameter lower bound)
        assert out["a"]["ecc"] == 4 and out["a"]["sum_hops"] == 10
        assert out["a"]["degree"] == 1 and out["c"]["degree"] == 2

    def test_isolated_pivot_null_closeness(self, spark):
        from dr_source_spark.operators.graph import eccentricity_profile

        # self-loop-only node is dropped entirely (src != dst filter), so
        # the only pivots come from the real edge; a 1-edge graph yields
        # two pivots, both fully reaching each other.
        e = _edges(spark, [("a", "p", "b"), ("z", "p", "z")])
        out = {
            r["pivot_node"]: r
            for r in eccentricity_profile(e, n_pivots=4, max_hops=2).collect()
        }
        assert set(out) == {"a", "b"}
        assert out["a"]["ecc"] == 1 and out["a"]["closeness_bp"] == 10000

    def test_max_hops_truncates(self, spark):
        from dr_source_spark.operators.graph import eccentricity_profile

        e = _edges(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
        out = {
            r["pivot_node"]: r
            for r in eccentricity_profile(e, n_pivots=1, max_hops=1).collect()
        }
        (r,) = out.values()
        assert r["ecc"] == 1  # BFS stopped at hop 1


class TestBurstiness:
    def test_bursty_vs_uniform(self, spark):
        from dr_source_spark.training.text import burstiness

        # 4 docs; 'the' appears once per doc (Poisson-ish: VMR = 1 ->
        # x100 = 100 after the mean shift correction below);
        # 'loch' appears 4 times in ONE doc (bursty).
        docs = spark.createDataFrame(
            [
                (1, "the loch loch loch loch"),
                (2, "the"),
                (3, "the"),
                (4, "the"),
            ],
            "doc_id long, text string",
        )
        out = {r["word"]: r for r in burstiness(docs, min_total=4, k=10).collect()}
        # the: x = (1,1,1,1), N=4, S1=4, S2=4 -> VMR = (16-16)/(16) = 0
        assert out["the"]["vmr_x100"] == 0
        # loch: x = (4,0,0,0), S1=4, S2=16 -> (4*16-16)*100 div (4*4) = 300
        assert out["loch"]["vmr_x100"] == 300
        assert out["loch"]["n_docs"] == 1 and out["loch"]["n_total"] == 4

    def test_null_text_counts_in_n(self, spark):
        from dr_source_spark.training.text import burstiness

        # the NULL doc dilutes the mean -> variance rises; N must be 3
        docs = spark.createDataFrame(
            [(1, "w w"), (2, "w w"), (3, None)],
            "doc_id long, text string",
        )
        (r,) = burstiness(docs, min_total=1, k=5).collect()
        # x = (2,2,0): N=3, S1=4, S2=8 -> 100*(24-16) div 12 = 66
        assert r["word"] == "w" and r["vmr_x100"] == 66

    def test_min_total_cut_and_k(self, spark):
        from dr_source_spark.training.text import burstiness

        docs = spark.createDataFrame(
            [(1, "a a a b")], "doc_id long, text string"
        )
        words = [r["word"] for r in burstiness(docs, min_total=2, k=10).collect()]
        assert words == ["a"]  # b has n_total 1 < 2
