"""Planted-truth tests for the batch-35 operators: exact max drawdown,
two-sample Kolmogorov-Smirnov, and the HHI concentration index."""

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 3, 1, 9, 0)


class TestMaxDrawdown:
    def _run(self, spark, daily):
        from dr_source_spark.operators.stats import max_drawdown_by_group

        rows = [("g", T0 + dt.timedelta(days=i), v) for i, v in enumerate(daily)]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, v long")
        return max_drawdown_by_group(df, "grp", "ts", F.col("v")).collect()[0]

    def test_peak_then_trough(self, spark):
        # 10, 50, 20, 5, 30: peak 50 (day 2), trough 5 (day 4) -> 45
        r = self._run(spark, [10, 50, 20, 5, 30])
        assert r["drawdown"] == 45
        assert r["peak_day"].isoformat() == "2024-03-02"
        assert r["trough_day"].isoformat() == "2024-03-04"

    def test_monotone_rise_is_zero(self, spark):
        r = self._run(spark, [1, 2, 3])
        assert r["drawdown"] == 0
        # earliest trough tie (every day has dd=0) -> first day; its
        # running peak is itself
        assert r["peak_day"] == r["trough_day"]
        assert r["trough_day"].isoformat() == "2024-03-01"

    def test_earliest_peak_on_value_tie(self, spark):
        # peak value 50 occurs on days 2 AND 4 before the trough: the
        # EARLIEST day with that value wins
        r = self._run(spark, [10, 50, 40, 50, 5])
        assert r["drawdown"] == 45
        assert r["peak_day"].isoformat() == "2024-03-02"

    def test_fall_before_bigger_rally_ignored(self, spark):
        # early shallow dip (20->15) vs later deep fall (100->30)
        r = self._run(spark, [20, 15, 100, 30])
        assert r["drawdown"] == 70


class TestKsTwoSample:
    def _run(self, spark, a_vals, b_vals):
        from dr_source_spark.operators.stats import ks_two_sample

        rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v long")
        return ks_two_sample(df, "g", F.col("v"), "A", "B").collect()[0]

    def test_identical_distributions(self, spark):
        r = self._run(spark, [1, 2, 3], [1, 2, 3])
        assert r["d_bp"] == 0

    def test_disjoint_supports_give_d_one(self, spark):
        # A entirely below B: at v=2, F_a=1, F_b=0 -> D=1
        r = self._run(spark, [1, 2], [10, 20])
        assert r["d_bp"] == 10_000
        assert r["d_at"] == 2

    def test_known_d(self, spark):
        # A={1,2,3,4}, B={3,4,5,6}: max gap at v=2 (Fa=1/2, Fb=0) -> 0.5
        r = self._run(spark, [1, 2, 3, 4], [3, 4, 5, 6])
        assert r["n_a"] == 4 and r["n_b"] == 4
        assert r["d_bp"] == 5_000
        assert r["d_at"] == 2

    def test_value_absent_from_one_side_advances_other(self, spark):
        # v=5 exists only in B; the grid row must still carry A's CDF
        r = self._run(spark, [1, 9], [5, 9])
        # at v=5: Fa=1/2, Fb=1/2 -> gap 0; at v=1: Fa=1/2, Fb=0 -> D=1/2
        assert r["d_bp"] == 5_000
        assert r["d_at"] == 1


class TestHhi:
    def _run(self, spark, rows):
        from dr_source_spark.operators.stats import hhi_by_group

        df = spark.createDataFrame(rows, "grp string, m long, w long")
        out = hhi_by_group(df, "grp", "m", F.col("w"))
        return {r["grp"]: r for r in out.collect()}

    def test_monopoly_and_even_split(self, spark):
        rows = [("mono", 1, 100)] + [("even", i, 25) for i in range(4)]
        out = self._run(spark, rows)
        assert out["mono"]["hhi_bp"] == 10_000
        assert out["even"]["hhi_bp"] == 2_500  # 1e4 / 4

    def test_weights_accumulate_per_member(self, spark):
        # member 1 split over three rows must square ONCE: (60,40) ->
        # 0.6^2+0.4^2 = 0.52
        rows = [("g", 1, 20), ("g", 1, 20), ("g", 1, 20), ("g", 2, 40)]
        out = self._run(spark, rows)
        assert out["g"]["n_members"] == 2
        assert out["g"]["hhi_bp"] == 5_200

    def test_nonpositive_weights_dropped(self, spark):
        rows = [("g", 1, 50), ("g", 2, 50), ("g", 3, 0), ("g", 4, -10)]
        out = self._run(spark, rows)
        assert out["g"]["n_members"] == 2
        assert out["g"]["hhi_bp"] == 5_000
