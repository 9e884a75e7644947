"""Planted-truth tests for the batch-34 operators: in-engine recall@k
audit and the exact pairwise audience-overlap matrix."""

from pyspark.sql import functions as F


class TestRecallAudit:
    def _run(self, spark, truth_rows, cand_rows, k):
        from dr_source_spark.training.similarity import recall_audit

        t = spark.createDataFrame(truth_rows, "q_id long, n_id long")
        c = spark.createDataFrame(cand_rows, "q_id long, n_id long")
        return {r["q_id"]: r for r in recall_audit(c, t, k).collect()}

    def test_partial_and_full_recall(self, spark):
        truth = [(0, 1), (0, 2), (0, 3), (1, 7), (1, 8), (1, 9)]
        cand = [(0, 1), (0, 2), (0, 99), (1, 7), (1, 8), (1, 9)]
        out = self._run(spark, truth, cand, 3)
        assert out[0]["n_hits"] == 2 and out[0]["recall_bp"] == 6666
        assert out[1]["n_hits"] == 3 and out[1]["recall_bp"] == 10000

    def test_lost_query_reports_zero(self, spark):
        # the candidate stage returned NOTHING for q=5: the truth-side
        # spine must still emit a row with recall 0 (absence would hide
        # exactly the worst failure)
        truth = [(5, 1), (5, 2)]
        out = self._run(spark, truth, [(9, 9)], 2)
        assert out[5]["n_hits"] == 0 and out[5]["recall_bp"] == 0

    def test_candidate_extras_never_count(self, spark):
        truth = [(0, 1)]
        cand = [(0, 1), (0, 2), (0, 3), (0, 4)]
        out = self._run(spark, truth, cand, 1)
        assert out[0]["n_hits"] == 1 and out[0]["recall_bp"] == 10000


class TestAudienceOverlap:
    def _run(self, spark, rows):
        from dr_source_spark.operators.relational import audience_overlap

        df = spark.createDataFrame(rows, "cat string, ent long")
        out = audience_overlap(df, "cat", "ent")
        return {(r["cat_a"], r["cat_b"]): r for r in out.collect()}

    def test_exact_jaccard(self, spark):
        # A = {1,2,3}, B = {2,3,4}: inter 2, union 4 -> 5000 bp
        rows = [("A", 1), ("A", 2), ("A", 3), ("B", 2), ("B", 3), ("B", 4)]
        out = self._run(spark, rows)
        r = out[("A", "B")]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 3, 2)
        assert r["jaccard_bp"] == 5000

    def test_volume_does_not_inflate(self, spark):
        # entity 2 appears 100x in A: still ONE incidence row
        rows = [("A", 2)] * 100 + [("A", 1), ("B", 2)]
        out = self._run(spark, rows)
        r = out[("A", "B")]
        assert r["n_a"] == 2 and r["n_both"] == 1
        assert r["jaccard_bp"] == 5000  # 1 / (2 + 1 - 1)

    def test_disjoint_pair_reported_as_zero(self, spark):
        rows = [("A", 1), ("B", 2), ("C", 1)]
        out = self._run(spark, rows)
        assert len(out) == 3  # all pairs present
        assert out[("A", "B")]["n_both"] == 0
        assert out[("A", "B")]["jaccard_bp"] == 0
        assert out[("A", "C")]["jaccard_bp"] == 10000
