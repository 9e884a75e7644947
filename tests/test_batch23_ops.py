"""Planted-truth tests for the batch-23 operators: (alpha,beta)
bipartite core peeling and exact sliding distinct-actives."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


class TestBipartiteCore:
    def _run(self, spark, pairs, **kw):
        e = spark.createDataFrame(pairs, "src string, dst string")
        from dr_source_spark.operators.graph import bipartite_core

        return bipartite_core(e, **kw).collect()

    def test_sided_thresholds(self, spark):
        # suppliers s1 (3 parts), s2 (1 part); parts p1 (2 supps),
        # p2/p3 (1 supp). alpha=2, beta=2: round 1 drops s2 (deg 1) and
        # p2, p3 (deg 1) -> s1-p1 remains but now s1 has deg 1 < alpha
        # -> round 2 empties the core. The cascade IS the semantics.
        pairs = [("s1", "p1"), ("s1", "p2"), ("s1", "p3"), ("s2", "p1")]
        assert self._run(spark, pairs, alpha=2, beta=2, rounds=3) == []

    def test_stable_core_survives(self, spark):
        # complete 2x2 biclique + a pendant: the biclique is a stable
        # (2,2)-core; the pendant edge peels in round 1
        pairs = [("s1", "p1"), ("s1", "p2"), ("s2", "p1"), ("s2", "p2"), ("s3", "p1")]
        out = self._run(spark, pairs, alpha=2, beta=2, rounds=3)
        got = {(r["src"], r["dst"]): (r["left_deg"], r["right_deg"]) for r in out}
        assert set(got) == {("s1", "p1"), ("s1", "p2"), ("s2", "p1"), ("s2", "p2")}
        assert all(v == (2, 2) for v in got.values())

    def test_rounds_bound_contract(self, spark):
        # a chain that needs 2 rounds to fully peel: rounds=1 must stop
        # after one peel (bounded-round contract, not a fixpoint)
        pairs = [("s1", "p1"), ("s1", "p2"), ("s2", "p2"), ("s2", "p3")]
        one = self._run(spark, pairs, alpha=2, beta=1, rounds=1)
        # round 1: all suppliers have deg 2, all parts deg >= 1 -> no drop
        assert len(one) == 4

    def test_rounds_guard(self, spark):
        from dr_source_spark.operators.graph import bipartite_core

        e = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            bipartite_core(e, rounds=0)


class TestSlidingDistinctActives:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [(u, dt.datetime(2024, 1, d, 12, 0)) for u, d in rows],
            "user_id long, ts timestamp",
        )

    def test_window_semantics(self, spark):
        from dr_source_spark.operators.relational import sliding_distinct_actives

        # user 1 on day 1; user 2 on day 5; user 1 again on day 9
        df = self._events(spark, [(1, 1), (2, 5), (1, 9)])
        out = {
            r["window_end"].isoformat(): (r["n_active"], r["n_events"])
            for r in sliding_distinct_actives(df, "user_id", "ts", 7).collect()
        }
        # day 5 window [day -1..5] sees users 1 and 2
        assert out["2024-01-05"] == (2, 2)
        # day 8 window [2..8] sees only user 2
        assert out["2024-01-08"] == (1, 1)
        # day 9 window [3..9] sees users 2 (day 5) and 1 (day 9)
        assert out["2024-01-09"] == (2, 2)
        # fanout is clamped to max day: no windows past day 9
        assert max(out) == "2024-01-09"

    def test_distinct_not_sum(self, spark):
        from dr_source_spark.operators.relational import sliding_distinct_actives

        # same user active on 3 consecutive days: n_active stays 1 while
        # n_events accumulates — the exact-distinct property the operator
        # exists for
        df = self._events(spark, [(7, 1), (7, 2), (7, 3)])
        out = {
            r["window_end"].day: (r["n_active"], r["n_events"])
            for r in sliding_distinct_actives(df, "user_id", "ts", 7).collect()
        }
        assert out[3] == (1, 3)
