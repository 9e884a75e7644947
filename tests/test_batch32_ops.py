"""Planted-truth tests for exact_quantiles_bisect — exact per-group
quantiles via value-domain binary search (no sort, no shuffle)."""

from pyspark.sql import functions as F


class TestQuantilesBisect:
    def _run(self, spark, rows, qs):
        from dr_source_spark.operators.stats import exact_quantiles_bisect

        df = spark.createDataFrame(rows, "grp string, v long")
        out = exact_quantiles_bisect(df, "grp", F.col("v"), qs)
        return {(r["grp"], r["q"]): r for r in out.collect()}

    def test_order_statistics_exact(self, spark):
        rows = [("g", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
        out = self._run(spark, rows, (0.5, 0.9, 1.0))
        # lower quantile: smallest v with count(<=v) >= ceil(q*n)
        assert out[("g", 0.5)]["value"] == 50   # k=5
        assert out[("g", 0.9)]["value"] == 90   # k=9
        assert out[("g", 1.0)]["value"] == 100  # k=10

    def test_duplicates_and_gaps(self, spark):
        # heavy ties and a huge value gap: bisection must land exactly
        rows = [("g", v) for v in [1, 1, 1, 1_000_000_007, 1_000_000_007]]
        out = self._run(spark, rows, (0.5, 0.99))
        assert out[("g", 0.5)]["value"] == 1          # k=3 -> value 1
        assert out[("g", 0.99)]["value"] == 1_000_000_007

    def test_matches_sort_window_convention(self, spark):
        # parity with the sort-window definition on an irregular fixture
        import math
        import random

        rng = random.Random(11)
        vals = [rng.randrange(-500, 500) for _ in range(137)]
        rows = [("g", v) for v in vals]
        out = self._run(spark, rows, (0.25, 0.5, 0.75, 0.9))
        s = sorted(vals)
        for q in (0.25, 0.5, 0.75, 0.9):
            k = max(1, math.ceil(q * len(s)))
            assert out[("g", q)]["value"] == s[k - 1], q

    def test_groups_and_negatives_independent(self, spark):
        rows = [("a", -10), ("a", -5), ("a", 0), ("b", 7)]
        out = self._run(spark, rows, (0.5,))
        assert out[("a", 0.5)]["value"] == -5
        assert out[("b", 0.5)]["value"] == 7
        assert out[("b", 0.5)]["n_rows"] == 1

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", 1), ("g", None), ("g", 3)], "grp string, v long"
        )
        from dr_source_spark.operators.stats import exact_quantiles_bisect

        out = exact_quantiles_bisect(df, "grp", F.col("v"), (1.0,)).collect()
        assert out[0]["n_rows"] == 2 and out[0]["value"] == 3
