"""Planted-truth tests for the batch-19 operators: Weisfeiler-Lehman
color refinement, Benford first-digit audit, Simpson diversity, and
Bowley quartile skewness."""

import pytest

from pyspark.sql import functions as F


class TestWLColors:
    def _run(self, spark, pairs, rounds=2):
        from dr_source_spark.operators.graph import wl_colors

        e = spark.createDataFrame(
            [(a, "p", b) for a, b in pairs], "src string, pred string, dst string"
        )
        return {r["node"]: r for r in wl_colors(e, rounds=rounds).collect()}

    def test_path4_two_roles(self, spark):
        # path a-b-c-d: ends {a,d} vs middles {b,c} — stable from round 1
        out = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert out["a"]["color"] == out["d"]["color"]
        assert out["b"]["color"] == out["c"]["color"]
        assert out["a"]["color"] != out["b"]["color"]
        assert out["a"]["class_size"] == 2 and out["b"]["class_size"] == 2

    def test_path5_center_isolated_at_round2(self, spark):
        # path a-b-c-d-e: round 1 already splits c ("2|2,2") from b,d
        # ("2|1,2"); round 2 keeps the 3-class partition {a,e},{b,d},{c}
        out = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        assert out["a"]["color"] == out["e"]["color"]
        assert out["b"]["color"] == out["d"]["color"]
        assert out["c"]["class_size"] == 1
        assert len({r["color"] for r in out.values()}) == 3

    def test_deterministic_label_values(self, spark):
        # labels are dense ranks in BINARY STRING ORDER of the signature:
        # on the 4-path round-2 signatures are "1|2" (ends) < "2|1,2"
        # (middles) -> ends get color 1, middles color 2, on ANY engine
        out = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert out["a"]["color"] == 1 and out["b"]["color"] == 2

    def test_rounds_guard(self, spark):
        from dr_source_spark.operators.graph import wl_colors

        e = spark.createDataFrame(
            [("a", "p", "b")], "src string, pred string, dst string"
        )
        with pytest.raises(ValueError):
            wl_colors(e, rounds=0)


class TestBenfordAudit:
    def test_digit_extraction_and_constants(self, spark):
        from dr_source_spark.operators.stats import benford_audit

        df = spark.createDataFrame(
            [(100,), (25,), (250,), (3000,), (-5,), (0,)], "v long"
        )
        out = {r["digit"]: r for r in benford_audit(df, F.col("v")).collect()}
        assert set(out) == {1, 2, 3}  # non-positive rows excluded
        assert out[1]["n_obs"] == 1 and out[2]["n_obs"] == 2
        # N = 4 positives: shares 2500 / 5000 / 2500
        assert out[1]["obs_x10000"] == 2500
        assert out[2]["obs_x10000"] == 5000
        assert out[1]["exp_x10000"] == 3010 and out[2]["exp_x10000"] == 1761
        assert out[1]["dev_x10000"] == 2500 - 3010
        assert out[2]["dev_x10000"] == 5000 - 1761
        assert out[3]["dev_x10000"] == 2500 - 1249


class TestSimpsonDiversity:
    def test_closed_form(self, spark):
        from dr_source_spark.training.text import simpson_diversity

        docs = spark.createDataFrame(
            [("it", 1, "a a b"), ("fr", 2, "x"), ("de", 3, None)],
            "lang string, doc_id long, text string",
        )
        out = {r["grp"]: r for r in simpson_diversity(docs).collect()}
        # it: counts a=2, b=1 -> sum c(c-1) = 2; N(N-1) = 6 -> 3333 bp
        assert out["it"]["n_tokens"] == 3 and out["it"]["n_types"] == 2
        assert out["it"]["simpson_bp"] == 3333
        assert out["it"]["gini_simpson_bp"] == 10000 - 3333
        # fr: a single token -> statistic undefined
        assert out["fr"]["simpson_bp"] is None
        # de: zero tokens -> no (grp, word) rows survive the explode, so
        # the group vanishes entirely (absence IS the contract)
        assert "de" not in out


class TestBowleySkew:
    def _run(self, spark, vals):
        from dr_source_spark.operators.stats import bowley_skew_by_group

        df = spark.createDataFrame(
            [("g", v, i) for i, v in enumerate(vals)], "grp string, v long, id long"
        )
        return bowley_skew_by_group(df, "grp", "v", "id").collect()[0]

    def test_symmetric_zero(self, spark):
        r = self._run(spark, [0, 1, 2, 3, 100])
        # ranks 2/3/4 under the (n-1)p div 100 + 1 convention -> 1, 2, 3
        assert (r["q1"], r["q2"], r["q3"]) == (1, 2, 3)
        assert r["bowley_x10000"] == 0

    def test_right_skew(self, spark):
        r = self._run(spark, [0, 0, 1, 10, 10])
        assert (r["q1"], r["q2"], r["q3"]) == (0, 1, 10)
        # (0 + 10 - 2) * 10000 div 10 = 8000
        assert r["bowley_x10000"] == 8000

    def test_left_skew_sign_factored(self, spark):
        r = self._run(spark, [0, 9, 10, 10, 10])
        assert (r["q1"], r["q2"], r["q3"]) == (9, 10, 10)
        # num = 9 + 10 - 20 = -1, den = 1 -> exactly -10000
        assert r["bowley_x10000"] == -10000

    def test_zero_iqr_null(self, spark):
        r = self._run(spark, [5, 5, 5, 5])
        assert r["bowley_x10000"] is None
