"""Planted-truth tests for the batch-24 operators: KG schema-graph
summary and the exact maximum-subarray (best-run) detector."""

import datetime as dt

from pyspark.sql import functions as F


class TestSchemaGraph:
    def test_kind_classes_and_counts(self, spark):
        from dr_source_spark.operators.triples import schema_graph

        triples = spark.createDataFrame(
            [
                ("repo:a.py@c", "HAS_VULN", "CWE-89", 1, "r"),
                ("repo:b.py@c", "HAS_VULN", "CWE-89", 2, "r"),
                ("repo:a.py@c", "HAS_VULN", "CWE-78", 3, "r"),
                ("repo:a.py@c#var:x", "FLOWS_TO", "SINK (y)@L5", 4, "r"),
                # duplicate triple (different line) must count once
                ("repo:a.py@c", "HAS_VULN", "CWE-89", 9, "r"),
            ],
            "subj string, pred string, obj string, line int, run_id string",
        )
        out = {
            (r["subj_kind"], r["pred"], r["obj_kind"]): r
            for r in schema_graph(triples).collect()
        }
        assert set(out) == {
            ("file", "HAS_VULN", "cwe"),
            ("entity", "FLOWS_TO", "sink"),
        }
        r = out[("file", "HAS_VULN", "cwe")]
        assert r["n_edges"] == 3  # dedup across lines
        assert r["n_subjects"] == 2 and r["n_objects"] == 2


class TestBestRun:
    def _run(self, spark, daily_cents, ts0=dt.datetime(2024, 3, 1, 9, 0)):
        rows = [
            ("g", ts0 + dt.timedelta(days=i), c)
            for i, c in enumerate(daily_cents)
        ]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, cents long")
        from dr_source_spark.operators.stats import best_run_by_group

        return best_run_by_group(df, "grp", "ts", F.col("cents")).collect()[0]

    def test_hot_streak_localized(self, spark):
        # 8 days, mean 100: days 4-5 carry the spike
        r = self._run(spark, [100, 100, 100, 300, 300, 100, 100, 100])
        assert r["start_day"].isoformat() == "2024-03-04"
        assert r["end_day"].isoformat() == "2024-03-05"
        assert r["run_len"] == 2
        # dev = n*x - S: S = 1200, n = 8 -> spike days dev = 8*300-1200
        assert r["best_sum_scaled"] == 2 * (8 * 300 - 1200)

    def test_gap_breaks_streak(self, spark):
        # two spikes separated by THREE dead (densified zero) days: the
        # bridge costs 3 x 1020 scaled vs the second spike's +2480, so
        # the best run is a single spike. (A one-day gap does NOT break
        # it — bridging one -1020 day to gain +1480 is optimal, which
        # rejected this test's first cut: max-subarray semantics, not a
        # bug.)
        rows = [
            ("g", dt.datetime(2024, 3, 1), 500),
            ("g", dt.datetime(2024, 3, 5), 500),
            ("g", dt.datetime(2024, 3, 6), 10),
            ("g", dt.datetime(2024, 3, 7), 10),
        ]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, cents long")
        from dr_source_spark.operators.stats import best_run_by_group

        r = best_run_by_group(df, "grp", "ts", F.col("cents")).collect()[0]
        assert r["run_len"] == 1
        assert r["start_day"].isoformat() == "2024-03-01"  # earliest spike
        assert r["n_days"] == 7  # densified calendar includes the gap days

    def test_tie_breaks_earliest(self, spark):
        # two equal spikes far enough apart that bridging loses (three
        # below-mean days cost more than the second spike gains): a true
        # tie, broken to the earliest end day. (With one day between,
        # bridging WINS — 2400-1600+2400 > 2400 — which rejected this
        # test's first cut.)
        r = self._run(spark, [100, 900, 100, 100, 100, 900, 100])
        assert r["start_day"].isoformat() == "2024-03-02"
        assert r["end_day"].isoformat() == "2024-03-02"
        assert r["run_len"] == 1

    def test_whole_series_constant(self, spark):
        # constant series: every dev = 0, best = 0; earliest single day
        r = self._run(spark, [50, 50, 50])
        assert r["best_sum_scaled"] == 0
        assert r["start_day"].isoformat() == "2024-03-01"
        assert r["end_day"].isoformat() == "2024-03-01"
