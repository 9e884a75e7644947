"""Planted-truth tests for the batch-30 operators: interval-union
coverage (sweep line), exact weighted median, and per-document Yule's K."""

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, offsets_min, grp="g"):
    rows = [(grp, T0 + dt.timedelta(minutes=m)) for m in offsets_min]
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


class TestIntervalUnion:
    def _run(self, spark, offsets_min, dur=30):
        from dr_source_spark.operators.relational import interval_union_time

        df = _events(spark, offsets_min)
        return interval_union_time(df, "event_type", "ts", dur).collect()[0]

    def test_overlap_counted_once(self, spark):
        # [0,30) U [10,40) = [0,40): 40 min covered, one component
        r = self._run(spark, [0, 10])
        assert r["covered_us"] == 40 * 60_000_000
        assert r["n_components"] == 1
        assert r["span_us"] == 40 * 60_000_000
        assert r["coverage_bp"] == 10_000

    def test_disjoint_components(self, spark):
        # [0,30) and [60,90): 60 min covered over a 90-min span
        r = self._run(spark, [0, 60])
        assert r["covered_us"] == 60 * 60_000_000
        assert r["n_components"] == 2
        assert r["span_us"] == 90 * 60_000_000
        assert r["coverage_bp"] == 6_666  # truncating div

    def test_touching_intervals_merge(self, spark):
        # [0,30) U [30,60) = [0,60): the end boundary of the first IS the
        # start of the second — half-open semantics make the union seam-
        # free (concurrency never returns to 0 at the seam instant)
        r = self._run(spark, [0, 30])
        assert r["covered_us"] == 60 * 60_000_000
        assert r["n_components"] == 1

    def test_single_event(self, spark):
        r = self._run(spark, [0])
        assert r["n_events"] == 1
        assert r["covered_us"] == r["span_us"] == 30 * 60_000_000
        assert r["coverage_bp"] == 10_000

    def test_groups_independent(self, spark):
        from dr_source_spark.operators.relational import interval_union_time

        df = _events(spark, [0, 60], grp="a").union(_events(spark, [0, 10], grp="b"))
        out = {r["event_type"]: r for r in interval_union_time(df).collect()}
        assert out["a"]["n_components"] == 2
        assert out["b"]["n_components"] == 1


class TestWeightedMedian:
    def _run(self, spark, rows):
        from dr_source_spark.operators.stats import weighted_median_by_group

        df = spark.createDataFrame(rows, "grp string, v long, w long")
        return weighted_median_by_group(df, "grp", F.col("v"), F.col("w")).collect()

    def test_heavy_tail_wins(self, spark):
        # weights 1,1,10: half of W=12 is only reached at v=3
        out = self._run(spark, [("g", 1, 1), ("g", 2, 1), ("g", 3, 10)])
        assert out[0]["weighted_median"] == 3
        assert out[0]["total_weight"] == 12

    def test_ties_accumulate_atomically(self, spark):
        # two rows of v=5 (3+3=6) cross half of W=8 at v=5
        out = self._run(spark, [("g", 5, 3), ("g", 5, 3), ("g", 10, 2)])
        assert out[0]["weighted_median"] == 5
        assert out[0]["n_values"] == 2  # the (grp, v) grid, not raw rows

    def test_even_split_takes_lower(self, spark):
        # W=2, cumw at v=1 is exactly half: 2*1 >= 2 -> lower median
        out = self._run(spark, [("g", 1, 1), ("g", 2, 1)])
        assert out[0]["weighted_median"] == 1

    def test_nonpositive_weights_and_null_values_dropped(self, spark):
        from dr_source_spark.operators.stats import weighted_median_by_group

        df = spark.createDataFrame(
            [("g", 1, 0), ("g", None, 9), ("g", 7, 2)],
            "grp string, v long, w long",
        )
        out = weighted_median_by_group(df, "grp", F.col("v"), F.col("w")).collect()
        assert out[0]["weighted_median"] == 7
        assert out[0]["total_weight"] == 2


class TestYuleK:
    def _run(self, spark, texts):
        from dr_source_spark.training.text import yule_k

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {r["doc_id"]: r for r in yule_k(df).collect()}

    def test_pure_repetition(self, spark):
        # "a a a a": N=4, S2=16 -> K = 1e4*12/16 = 7500 -> k_x100=750000
        r = self._run(spark, ["a a a a"])[0]
        assert r["n_tokens"] == 4 and r["n_types"] == 1
        assert r["k_x100"] == 750_000

    def test_all_distinct_is_zero(self, spark):
        r = self._run(spark, ["a b c d"])[0]
        assert r["k_x100"] == 0

    def test_case_folds_to_one_type(self, spark):
        # "The the": one type twice -> K = 1e4*2/4 = 5000 -> 500000
        r = self._run(spark, ["The the"])[0]
        assert r["n_types"] == 1
        assert r["k_x100"] == 500_000

    def test_degenerate_docs_keep_rows(self, spark):
        out = self._run(spark, [None, "", "solo"])
        assert set(out) == {0, 1, 2}  # audit invariant: every doc verdicts
        for i in (0, 1):
            assert out[i]["n_tokens"] == 0 and out[i]["k_x100"] is None
        assert out[2]["n_tokens"] == 1 and out[2]["k_x100"] is None
