"""Planted-truth tests for the batch-31 operators: chi-square cell
residuals, the Mann-Kendall trend test, and the approximate-FD
violation census."""

import datetime as dt
import math

from pyspark.sql import functions as F


class TestChi2CellResiduals:
    def test_cells_match_float_formula(self, spark):
        from dr_source_spark.operators.stats import chi2_cell_residuals

        rows = (
            [("a", "u")] * 6 + [("a", "v")] * 1
            + [("b", "u")] * 2 + [("b", "v")] * 5
            + [("c", "u")] * 4
        )
        df = spark.createDataFrame(rows, "x string, y string")
        out = {(r["x"], r["y"]): r for r in chi2_cell_residuals(df, "x", "y").collect()}
        assert len(out) == 6  # full 3x2 grid, zero cell included
        from collections import Counter

        obs = Counter(rows)
        rt, ct, n = Counter(x for x, _ in rows), Counter(y for _, y in rows), len(rows)
        for (x, y), r in out.items():
            exp = rt[x] * ct[y] / n
            assert r["obs"] == obs.get((x, y), 0)
            assert abs(r["exp_x100"] - exp * 100) < 1  # truncating div
            resid = (obs.get((x, y), 0) - exp) / math.sqrt(exp)
            assert abs(r["resid_x100"] - resid * 100) <= 2
            # sign must be exact, not just magnitude
            if abs(resid) > 0.05:
                assert (r["resid_x100"] > 0) == (resid > 0)

    def test_zero_cell_has_negative_residual(self, spark):
        from dr_source_spark.operators.stats import chi2_cell_residuals

        rows = [("a", "u")] * 5 + [("b", "v")] * 5
        df = spark.createDataFrame(rows, "x string, y string")
        out = {(r["x"], r["y"]): r for r in chi2_cell_residuals(df, "x", "y").collect()}
        # exp = 2.5 for every cell; zero cells: resid = -2.5/sqrt(2.5)
        z = out[("a", "v")]
        assert z["obs"] == 0
        assert z["exp_x100"] == 250
        assert abs(z["resid_x100"] - (-158)) <= 1  # -sqrt(2.5)*100


class TestMannKendall:
    def _run(self, spark, daily, grp="g"):
        from dr_source_spark.operators.stats import mann_kendall_by_group

        t0 = dt.datetime(2024, 3, 1, 9, 0)
        rows = [(grp, t0 + dt.timedelta(days=i), v) for i, v in enumerate(daily)]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, v long")
        return mann_kendall_by_group(df, "grp", "ts", F.col("v")).collect()[0]

    def test_strictly_increasing(self, spark):
        # n=10 strictly increasing: S = C(10,2) = 45, no ties ->
        # var18 = 10*9*25 = 2250, z = 44/sqrt(125) = 3.935
        r = self._run(spark, list(range(1, 11)))
        assert r["s_stat"] == 45
        assert r["var18"] == 2250
        assert abs(r["z_x100"] - 393) <= 1
        assert r["z_x100"] >= 196  # flagged as a trend

    def test_strictly_decreasing_is_mirror(self, spark):
        r = self._run(spark, list(range(10, 0, -1)))
        assert r["s_stat"] == -45
        assert abs(r["z_x100"] + 393) <= 1

    def test_all_tied_is_null(self, spark):
        # every day equal: S = 0 and the tie correction kills the
        # variance entirely (var18 = 0) -> z undefined
        r = self._run(spark, [7, 7, 7, 7])
        assert r["s_stat"] == 0
        assert r["var18"] == 0
        assert r["z_x100"] is None

    def test_ties_reduce_variance(self, spark):
        # [1, 2, 2, 3]: one tie pair of extent 2 -> tie_term = 2*1*9 = 18
        r = self._run(spark, [1, 2, 2, 3])
        assert r["n_days"] == 4
        assert r["var18"] == 4 * 3 * 13 - 18  # 138
        assert r["s_stat"] == 5  # 6 pairs: 5 concordant, 1 tied

    def test_intraday_rows_presum(self, spark):
        # two rows on one day must sum BEFORE the pair test: days are
        # (3, 1) descending, not (1, 2, 1) mixed
        from dr_source_spark.operators.stats import mann_kendall_by_group

        t0 = dt.datetime(2024, 3, 1, 9, 0)
        rows = [
            ("g", t0, 1),
            ("g", t0 + dt.timedelta(hours=2), 2),
            ("g", t0 + dt.timedelta(days=1), 1),
        ]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, v long")
        r = mann_kendall_by_group(df, "grp", "ts", F.col("v")).collect()[0]
        assert r["n_days"] == 2
        assert r["s_stat"] == -1


class TestFdViolationCensus:
    def _run(self, spark, rows, pairs):
        from dr_source_spark.operators.relational import fd_violation_census

        df = spark.createDataFrame(rows, "k string, v string")
        out = fd_violation_census(df, pairs)
        return {r["fd"]: r for r in out.collect()}

    def test_exact_fd_holds(self, spark):
        out = self._run(
            spark,
            [("a", "x"), ("a", "x"), ("b", "y")],
            [("k", "v")],
        )
        r = out["k -> v"]
        assert r["n_violating_keys"] == 0
        assert r["n_violating_rows"] == 0
        assert r["support_bp"] == 10_000

    def test_g3_counts_minority_rows(self, spark):
        # key a: 3x 'x', 1x 'y' -> 1 violating row; key b clean
        out = self._run(
            spark,
            [("a", "x")] * 3 + [("a", "y")] + [("b", "z")] * 2,
            [("k", "v")],
        )
        r = out["k -> v"]
        assert r["n_keys"] == 2
        assert r["n_violating_keys"] == 1
        assert r["n_violating_rows"] == 1
        assert r["n_rows"] == 6
        assert r["support_bp"] == 8_333  # 5*1e4 div 6, truncating

    def test_majority_tie_breaks_deterministically(self, spark):
        # 2x 'x', 2x 'y': majority is the SMALLER string -> 2 kept either
        # way, but the pick must not depend on engine order
        out = self._run(
            spark, [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y")], [("k", "v")]
        )
        assert out["k -> v"]["n_violating_rows"] == 2

    def test_null_semantics(self, spark):
        # NULL key rows carry no FD evidence; NULL dep is a real value
        out = self._run(
            spark,
            [(None, "x"), ("a", None), ("a", None), ("a", "x")],
            [("k", "v")],
        )
        r = out["k -> v"]
        assert r["n_rows"] == 3  # the NULL-key row is gone
        assert r["n_violating_rows"] == 1  # majority is the NULL value (2)

    def test_both_directions_union(self, spark):
        out = self._run(
            spark,
            [("a", "x"), ("b", "x"), ("b", "x")],
            [("k", "v"), ("v", "k")],
        )
        assert set(out) == {"k -> v", "v -> k"}
        assert out["k -> v"]["n_violating_rows"] == 0
        assert out["v -> k"]["n_violating_rows"] == 1  # x -> {a, b, b}
