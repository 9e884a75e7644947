"""Planted-truth tests for the batch-17 operators: exact walk-count
Katz centrality, sweep-line peak concurrency, Gini decision-stump
split search, and Theil-Sen robust trend."""

import datetime as dt

from pyspark.sql import functions as F


class TestWalkCounts:
    def test_path_graph_closed_form(self, spark):
        from dr_source_spark.operators.graph import walk_counts

        # a -> b -> c -> d: the only walks are the path prefixes, so
        # every cell is hand-computable.
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        out = {r["node"]: r for r in walk_counts(edges, rounds=3).collect()}
        assert {k: r["walks_1"] for k, r in out.items()} == {
            "a": 0, "b": 1, "c": 1, "d": 1
        }
        assert {k: r["walks_2"] for k, r in out.items()} == {
            "a": 0, "b": 0, "c": 1, "d": 1
        }
        assert {k: r["walks_3"] for k, r in out.items()} == {
            "a": 0, "b": 0, "c": 0, "d": 1
        }
        # katz_scaled = 16*w1 + 4*w2 + w3 (alpha_inv=4, rounds=3)
        assert out["d"]["katz_scaled"] == 16 + 4 + 1
        assert out["c"]["katz_scaled"] == 16 + 4
        assert out["b"]["katz_scaled"] == 16
        assert out["a"]["katz_scaled"] == 0

    def test_dups_and_self_loops_drop(self, spark):
        from dr_source_spark.operators.graph import walk_counts

        edges = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "b")], "src string, dst string"
        )
        out = {r["node"]: r for r in walk_counts(edges, rounds=2).collect()}
        # dup (a,b) counted once; self-loop (b,b) ignored entirely
        assert out["b"]["walks_1"] == 1 and out["b"]["walks_2"] == 0

    def test_rounds_guard(self, spark):
        import pytest

        from dr_source_spark.operators.graph import walk_counts

        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            walk_counts(edges, rounds=0)


class TestPeakConcurrency:
    def test_staircase_overlap(self, spark):
        from dr_source_spark.operators.relational import peak_concurrency

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            ("x", t0),
            ("x", t0 + dt.timedelta(minutes=10)),
            ("x", t0 + dt.timedelta(minutes=20)),
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = peak_concurrency(df, "event_type", "ts", 30).collect()
        assert len(out) == 1
        r = out[0]
        # [0,30) [10,40) [20,50): all three overlap first at minute 20
        assert r["peak_concurrency"] == 3
        assert r["peak_at"] == t0 + dt.timedelta(minutes=20)
        assert r["n_events"] == 3

    def test_half_open_boundary(self, spark):
        from dr_source_spark.operators.relational import peak_concurrency

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [("x", t0), ("x", t0 + dt.timedelta(minutes=30))]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = peak_concurrency(df, "event_type", "ts", 30).collect()[0]
        # interval ending at t is NOT active at t: back-to-back events
        # never overlap, and the peak is reached at the FIRST start
        assert r["peak_concurrency"] == 1
        assert r["peak_at"] == t0

    def test_tied_timestamps_atomic(self, spark):
        from dr_source_spark.operators.relational import peak_concurrency

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [("x", t0)] * 4, "event_type string, ts timestamp"
        )
        r = peak_concurrency(df, "event_type", "ts", 30).collect()[0]
        assert r["peak_concurrency"] == 4
        assert r["n_instants"] == 2  # one start instant + one end instant


class TestGiniBestSplit:
    def test_perfect_split_costs_zero(self, spark):
        from dr_source_spark.operators.stats import gini_best_split

        rows = [(1, False), (1, False), (2, True), (2, True)]
        df = spark.createDataFrame(rows, "v long, y boolean")
        out = {
            r["threshold"]: r
            for r in gini_best_split(df, F.col("v"), F.col("y")).collect()
        }
        # only threshold v<=1 is a candidate (max value excluded)
        assert set(out) == {1}
        r = out[1]
        assert (r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (
            2, 0, 2, 2
        )
        assert r["cost_scaled"] == 0 and r["rk"] == 1

    def test_best_split_ranks_first(self, spark):
        from dr_source_spark.operators.stats import gini_best_split

        # labels: v=1 -> all neg, v=2 -> all neg, v=3 -> all pos; the
        # clean cut is v<=2, and v<=1 leaves a mixed right side
        rows = (
            [(1, False)] * 2 + [(2, False)] * 2 + [(3, True)] * 2
        )
        df = spark.createDataFrame(rows, "v long, y boolean")
        out = {
            r["threshold"]: r
            for r in gini_best_split(df, F.col("v"), F.col("y")).collect()
        }
        assert out[2]["cost_scaled"] == 0 and out[2]["rk"] == 1
        # v<=1: right side n=4 pos=2 -> gini_R = 1/2, cost = 4*(1/2)*1e6 = 2e6
        assert out[1]["cost_scaled"] == 2_000_000 and out[1]["rk"] == 2


class TestTheilSen:
    def test_clean_trend_exact(self, spark):
        from dr_source_spark.operators.stats import theil_sen_by_group

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0 + dt.timedelta(days=i), 100 * i) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, cents long")
        out = theil_sen_by_group(
            df, F.col("g"), F.col("ts"), F.col("cents")
        ).collect()
        assert len(out) == 1
        r = out[0]
        # every pairwise slope is exactly 100 cents/day = 1_000_000 bp
        assert r["n_days"] == 3 and r["n_pairs"] == 3
        assert r["slope_bp_med"] == 1_000_000
        assert r["slope_bp_min"] == 1_000_000
        assert r["slope_bp_max"] == 1_000_000

    def test_outlier_robustness(self, spark):
        from dr_source_spark.operators.stats import theil_sen_by_group

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0 + dt.timedelta(days=i), 100 * i) for i in range(3)
        ] + [("a", t0 + dt.timedelta(days=3), 10_000)]
        df = spark.createDataFrame(rows, "g string, ts timestamp, cents long")
        r = theil_sen_by_group(
            df, F.col("g"), F.col("ts"), F.col("cents")
        ).collect()[0]
        # the outlier day contaminates 3 of 6 pairs but the LOWER median
        # ((6+1) div 2 = 3rd of the sorted slopes) stays on the trend
        assert r["n_pairs"] == 6
        assert r["slope_bp_med"] == 1_000_000
        assert r["slope_bp_max"] > 1_000_000

    def test_single_day_group_emits_nothing(self, spark):
        from dr_source_spark.operators.stats import theil_sen_by_group

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("solo", t0, 5), ("solo", t0, 7)],
            "g string, ts timestamp, cents long",
        )
        assert (
            theil_sen_by_group(
                df, F.col("g"), F.col("ts"), F.col("cents")
            ).count()
            == 0
        )
