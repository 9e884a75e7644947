"""Planted-truth tests for the batch-25 operator: exact chi-square
independence (+ Cramér's V) between two categorical columns."""

import math

from pyspark.sql import functions as F


def _chi2_float(rows):
    """Closed-form float chi-square over (x, y) tuples, for cross-checking
    the scaled-integer contract within its truncation envelope."""
    from collections import Counter

    obs = Counter(rows)
    rt = Counter(x for x, _ in rows)
    ct = Counter(y for _, y in rows)
    n = len(rows)
    chi2 = 0.0
    for x in rt:
        for y in ct:
            exp = rt[x] * ct[y] / n
            chi2 += (obs.get((x, y), 0) - exp) ** 2 / exp
    return chi2, len(rt), len(ct)


class TestChi2Independence:
    def _run(self, spark, rows):
        from dr_source_spark.operators.stats import chi2_independence

        df = spark.createDataFrame(rows, "x string, y string")
        return chi2_independence(df, "x", "y").collect()[0]

    def test_perfect_independence_is_zero(self, spark):
        # obs == exp exactly for every cell: a 2x2 with proportional rows
        rows = (
            [("a", "u")] * 4 + [("a", "v")] * 2
            + [("b", "u")] * 8 + [("b", "v")] * 4
        )
        r = self._run(spark, rows)
        assert r["n"] == 18
        assert r["dof"] == 1
        assert r["chi2_e6"] == 0
        assert r["cramers_v_bp"] == 0

    def test_perfect_association_is_v_one(self, spark):
        # x fully determines y: chi2 = n*min(r-1, c-1), V = 1
        rows = [("a", "u")] * 5 + [("b", "v")] * 7 + [("c", "w")] * 3
        r = self._run(spark, rows)
        assert r["n"] == 15
        assert r["n_levels_x"] == 3 and r["n_levels_y"] == 3
        assert r["dof"] == 4
        # chi2 = n * min(r-1, c-1) = 30; per-cell truncation only loses
        # sub-unit mass, so the e6 value sits within 9 (cells) of exact
        assert abs(r["chi2_e6"] - 30_000_000) <= 9
        assert abs(r["cramers_v_bp"] - 10_000) <= 1

    def test_matches_float_formula(self, spark):
        # an irregular 3x2 contingency; zero cell (c,v) included
        rows = (
            [("a", "u")] * 6 + [("a", "v")] * 1
            + [("b", "u")] * 2 + [("b", "v")] * 5
            + [("c", "u")] * 4
        )
        r = self._run(spark, rows)
        chi2, nr, nc = _chi2_float(rows)
        n = len(rows)
        # per-cell truncation: each of the r*c cells loses < 1 unit of e6
        assert abs(r["chi2_e6"] - chi2 * 1e6) < nr * nc
        v = math.sqrt(chi2 / (n * min(nr - 1, nc - 1)))
        assert abs(r["cramers_v_bp"] - v * 1e4) <= 2
        assert r["n"] == n and r["dof"] == (nr - 1) * (nc - 1)

    def test_nulls_excluded(self, spark):
        rows = [("a", "u"), ("a", None), (None, "u"), ("b", "v"), ("b", "v")]
        r = self._run(spark, rows)
        assert r["n"] == 3  # only fully-labelled rows count

    def test_single_level_column_yields_null_v(self, spark):
        # min(r-1, c-1) = 0: V undefined -> NULL, never a divide-by-zero
        r = self._run(spark, [("a", "u"), ("b", "u"), ("a", "u")])
        assert r["n_levels_y"] == 1 and r["dof"] == 0
        assert r["chi2_e6"] == 0
        assert r["cramers_v_bp"] is None

    def test_plan_no_cartesian_and_broadcast_joins(self, spark):
        # plan gate: the raw rows feed ONE partial+final aggregate pair
        # (the groupBy(x, y)); everything downstream — level totals, the
        # level-product, cell joins — runs on the tiny contingency with
        # broadcast joins only. The level product is an intentional
        # tiny-side BroadcastNestedLoopJoin (same pattern as the IVF
        # centroid assignment); a CartesianProduct would mean a non-
        # broadcast all-pairs plan and must never appear.
        from dr_source_spark.operators.stats import chi2_independence

        df = spark.range(1000).select(
            (F.col("id") % 3).cast("string").alias("x"),
            (F.col("id") % 5).cast("string").alias("y"),
        )
        plan = (
            chi2_independence(df, "x", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan  # every join side is tiny
