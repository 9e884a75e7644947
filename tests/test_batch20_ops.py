"""Planted-truth tests for the batch-20 operators: incremental
group-aggregate maintenance (IVM with retractions), histogram
join-cardinality estimation, and the Heaps vocabulary-growth curve."""

from pyspark.sql import functions as F


class TestMaintainGroupAgg:
    def _run(self, spark, base_rows, delta_rows):
        from dr_source_spark.operators.merge import maintain_group_agg

        base = spark.createDataFrame(
            base_rows, "grp string, n_rows long, sum_cents long"
        )
        delta = spark.createDataFrame(
            delta_rows, "grp string, v long, is_del boolean"
        )
        return {
            r["grp"]: r for r in maintain_group_agg(base, delta, "grp", "v", "is_del").collect()
        }

    def test_insert_delete_merge(self, spark):
        out = self._run(
            spark,
            [("g1", 2, 30), ("g3", 1, 9)],
            [("g1", 5, False), ("g1", 10, True), ("g2", 7, False), ("g3", 9, True)],
        )
        # g1: 2 rows/30c + insert(5) - delete(10) = 2 rows, 25c
        assert (out["g1"]["n_rows"], out["g1"]["sum_cents"]) == (2, 25)
        # g2: pure delta-born group
        assert (out["g2"]["n_rows"], out["g2"]["sum_cents"]) == (1, 7)
        # g3: fully retracted -> ABSENT (a recompute would produce no row)
        assert "g3" not in out

    def test_empty_delta_is_identity(self, spark):
        from dr_source_spark.operators.merge import maintain_group_agg

        base = spark.createDataFrame([("g", 3, 42)], "grp string, n_rows long, sum_cents long")
        delta = spark.createDataFrame([], "grp string, v long, is_del boolean")
        (r,) = maintain_group_agg(base, delta, "grp", "v", "is_del").collect()
        assert (r["grp"], r["n_rows"], r["sum_cents"]) == ("g", 3, 42)


class TestJoinCardinalityEstimate:
    def _run(self, spark, a_keys, b_keys, n_buckets=2):
        from dr_source_spark.operators.stats import join_cardinality_estimate

        a = spark.createDataFrame([(k,) for k in a_keys], "k long")
        b = spark.createDataFrame([(k,) for k in b_keys], "k long")
        return {
            r["bucket"]: r
            for r in join_cardinality_estimate(a, b, "k", "k", n_buckets).collect()
        }

    def test_uniform_keys_zero_error(self, spark):
        out = self._run(spark, [0, 1, 2, 3], [0, 1, 2, 3])
        for bkt in (0, 1):
            r = out[bkt]
            assert (r["n_a"], r["d_a"]) == (2, 2)
            assert r["est_rows"] == 2 and r["exact_rows"] == 2
            assert r["err_bp"] == 0

    def test_skew_underestimates(self, spark):
        # bucket 0: a = {0:5, 2:1}, b = {0:5, 2:1}
        out = self._run(spark, [0] * 5 + [2], [0] * 5 + [2])
        r = out[0]
        assert (r["n_a"], r["d_a"], r["n_b"], r["d_b"]) == (6, 2, 6, 2)
        assert r["est_rows"] == 36 // 2  # uniform assumption: 18
        assert r["exact_rows"] == 5 * 5 + 1  # reality: 26
        assert r["err_bp"] == -(10000 * 8 // 26)  # signed underestimate

    def test_one_sided_bucket(self, spark):
        out = self._run(spark, [1, 1, 1], [0])
        r = out[1]
        assert (r["n_a"], r["n_b"]) == (3, 0)
        assert r["est_rows"] == 0 and r["exact_rows"] == 0
        assert r["err_bp"] is None  # error undefined when exact = 0


class TestHeapsCurve:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_template_flood_flat_types(self, spark):
        from dr_source_spark.training.text import heaps_curve

        docs = self._docs(spark, ["a"] * 10)
        out = {r["checkpoint"]: r for r in heaps_curve(docs, 10).collect()}
        assert len(out) == 10
        for k in range(1, 11):
            assert out[k]["n_docs_cum"] == k
            assert out[k]["n_tokens_cum"] == k
            assert out[k]["n_types_cum"] == 1  # vocabulary never grows

    def test_diverse_corpus_linear_types(self, spark):
        from dr_source_spark.training.text import heaps_curve

        docs = self._docs(spark, [f"w{i}" for i in range(10)])
        out = {r["checkpoint"]: r for r in heaps_curve(docs, 10).collect()}
        for k in range(1, 11):
            assert out[k]["n_types_cum"] == k  # every doc brings a new word

    def test_null_text_occupies_position(self, spark):
        from dr_source_spark.training.text import heaps_curve

        # doc 2 is NULL: zero tokens but still a corpus position, so the
        # checkpoint at 20% covers docs {1, 2} with 1 token / 1 type
        docs = self._docs(spark, ["x", None, "y", "y", "y", "y", "y", "y", "y", "y"])
        out = {r["checkpoint"]: r for r in heaps_curve(docs, 10).collect()}
        assert out[2]["n_docs_cum"] == 2
        assert out[2]["n_tokens_cum"] == 1
        assert out[2]["n_types_cum"] == 1
        assert out[10]["n_types_cum"] == 2
