"""Planted-truth tests for the batch-33 operators: Simpson's-paradox
reversal audit and the per-CWE blast-radius census."""

from pyspark.sql import functions as F


class TestSimpsonReversal:
    def _run(self, spark, rows):
        from dr_source_spark.operators.stats import simpson_reversal_audit

        df = spark.createDataFrame(rows, "seg string, x long, y long")
        out = simpson_reversal_audit(df, F.col("x"), F.col("y"), "seg")
        return {r["seg"]: r for r in out.collect()}

    def test_textbook_reversal(self, spark):
        # classic construction: within each segment y DECREASES in x,
        # but segment B has both higher x and higher y than A, so the
        # pooled association is POSITIVE
        rows = [
            ("A", 1, 10), ("A", 2, 8),      # slope negative
            ("B", 10, 30), ("B", 11, 28),   # slope negative, shifted up
        ]
        out = self._run(spark, rows)
        assert out["A"]["cov_sign"] == -1
        assert out["B"]["cov_sign"] == -1
        assert out["A"]["pooled_sign"] == 1
        assert out["A"]["sign_flipped"] and out["B"]["sign_flipped"]

    def test_consistent_association_never_flags(self, spark):
        rows = [("A", 1, 1), ("A", 2, 2), ("B", 5, 5), ("B", 6, 7)]
        out = self._run(spark, rows)
        assert all(not r["sign_flipped"] for r in out.values())
        assert all(r["cov_sign"] == 1 for r in out.values())

    def test_degenerate_segment_is_zero_not_flagged(self, spark):
        # single-row segment: covariance numerator is exactly 0
        rows = [("A", 1, 9)] + [("B", 1, 1), ("B", 2, 2)]
        out = self._run(spark, rows)
        assert out["A"]["cov_sign"] == 0
        assert not out["A"]["sign_flipped"]

    def test_null_rows_dropped(self, spark):
        from dr_source_spark.operators.stats import simpson_reversal_audit

        df = spark.createDataFrame(
            [("A", 1, 1), ("A", 2, 2), ("A", None, 9)],
            "seg string, x long, y long",
        )
        out = simpson_reversal_audit(df, F.col("x"), F.col("y"), "seg").collect()
        assert out[0]["n_rows"] == 2


class TestBlastRadius:
    def _triples(self, spark, fc_pairs):
        rows = [
            (f, "HAS_VULN", c, 1, "", "r") for f, c in fc_pairs
        ] + [("repo:x@c#var:v", "FLOWS_TO", "SINK (q)@L5", 5, "", "r")]
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, line int, trace string, run_id string",
        )

    def test_two_hop_through_cooccurrence(self, spark):
        from dr_source_spark.operators.triples import blast_radius

        # f1: {89}, f2: {89, 78}, f3: {78}, f4: {22}
        # CWE-89 direct = {f1, f2}; co-occurs with 78 (via f2) ->
        # 2-hop = {f1, f2, f3}; CWE-22 is isolated
        t = self._triples(
            spark,
            [("f1", "CWE-89"), ("f2", "CWE-89"), ("f2", "CWE-78"),
             ("f3", "CWE-78"), ("f4", "CWE-22")],
        )
        out = {r["cwe"]: r for r in blast_radius(t).collect()}
        assert out["CWE-89"]["n_files_direct"] == 2
        assert out["CWE-89"]["n_cooccurring_cwes"] == 1
        assert out["CWE-89"]["n_files_2hop"] == 3
        assert out["CWE-78"]["n_files_2hop"] == 3
        assert out["CWE-22"]["n_files_direct"] == 1
        assert out["CWE-22"]["n_cooccurring_cwes"] == 0
        assert out["CWE-22"]["n_files_2hop"] == 1  # includes itself

    def test_duplicate_findings_count_once(self, spark):
        from dr_source_spark.operators.triples import blast_radius

        # the same (file, cwe) pair three times must not inflate counts
        t = self._triples(
            spark, [("f1", "CWE-89"), ("f1", "CWE-89"), ("f1", "CWE-89")]
        )
        out = blast_radius(t).collect()
        assert len(out) == 1
        assert out[0]["n_files_direct"] == 1
        assert out[0]["n_files_2hop"] == 1
