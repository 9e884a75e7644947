"""Planted-truth tests for the batch-22 operators: deterministic
greedy matching and content-defined chunking dedup census."""

import pytest

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in pairs], "src string, pred string, dst string"
    )


class TestGreedyMatching:
    def test_is_a_matching(self, spark):
        from dr_source_spark.operators.graph import greedy_matching

        # triangle + pendant: any valid matching uses node-disjoint edges
        out = greedy_matching(
            _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]),
            rounds=3,
        ).collect()
        nodes = [n for r in out for n in (r["a"], r["b"])]
        assert len(nodes) == len(set(nodes))  # no node matched twice

    def test_local_min_first_round(self, spark):
        from dr_source_spark.operators.graph import greedy_matching

        # path a-b-c-d: keys 'a|b' < 'b|c' < 'c|d'. Round 1: 'a|b' is min
        # at both a and b -> matched; 'c|d' is min at d but at c the min
        # is 'b|c' -> not matched. Round 2: only 'c|d' remains -> matched.
        out = {
            (r["a"], r["b"]): r["matched_round"]
            for r in greedy_matching(
                _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]), rounds=3
            ).collect()
        }
        assert out == {("a", "b"): 1, ("c", "d"): 2}

    def test_maximal_on_star(self, spark):
        from dr_source_spark.operators.graph import greedy_matching

        # star: only one edge can ever match
        out = greedy_matching(
            _edges(spark, [("hub", "x"), ("hub", "y"), ("hub", "z")]), rounds=3
        ).collect()
        assert len(out) == 1
        assert (out[0]["a"], out[0]["b"]) == ("hub", "x")  # min key wins

    def test_rounds_guard(self, spark):
        from dr_source_spark.operators.graph import greedy_matching

        with pytest.raises(ValueError):
            greedy_matching(_edges(spark, [("a", "b")]), rounds=0)


class TestCdcChunkCensus:
    def _census(self, spark, texts, **kw):
        docs = spark.createDataFrame(
            [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        from dr_source_spark.training.dedup import cdc_chunk_census

        return cdc_chunk_census(docs, **kw).collect()[0]

    def test_identical_docs_dedup_fully(self, spark):
        # NON-periodic text (distinct tokens): a periodic string like
        # "...dog " * 5 collapses to ONE unique chunk even within a
        # single doc (boundaries recur with the period — CDC working as
        # designed, first test cut rejected by the data)
        t = " ".join(f"tok{i}novel" for i in range(40))
        r = self._census(spark, [t, t, t])
        assert r["n_docs"] == 3
        assert r["total_chars"] == 3 * len(t)
        # three identical docs: the unique chunk set is ONE doc's set
        assert r["unique_chars"] == len(t)
        assert r["n_chunks"] == 3 * r["n_unique_chunks"]
        assert r["savings_bp"] == 10000 * 2 * len(t) // (3 * len(t))

    def test_prefix_insertion_shifts_one_chunk_class(self, spark):
        # the CDC property: prepending text to a near-duplicate leaves
        # the suffix chunks identical (boundaries re-synchronize), so
        # savings stay high — the census must see shared chunks
        t = "the quick brown fox jumps over the lazy dog " * 8
        r = self._census(spark, [t, "XYZ " + t])
        assert r["n_unique_chunks"] < r["n_chunks"]  # suffix chunks shared
        assert r["savings_bp"] > 3000  # well above zero-sharing

    def test_short_and_empty_docs(self, spark):
        # empty doc: no chunks; short doc (< w): one whole-doc chunk
        r = self._census(spark, ["", "abc"])
        assert r["n_docs"] == 2
        assert r["n_chunks"] == 1
        assert r["total_chars"] == 3

    def test_conservation(self, spark):
        # chunk lengths partition each doc exactly
        t1, t2 = "alpha beta gamma delta " * 6, "zeta eta theta " * 7
        r = self._census(spark, [t1, t2])
        assert r["total_chars"] == len(t1) + len(t2)
