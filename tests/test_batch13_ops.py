"""Planted-truth tests for the batch-13 operators: exact ACF,
Mann-Whitney U, rolling Bollinger bands, cohort matrix, resource-
allocation link prediction, weighted Bernoulli sampling."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


class TestAcfByGroup:
    def test_alternating_series_is_negative_lag1_positive_lag2(self, spark):
        from dr_source_spark.operators.stats import acf_by_group

        # 2,0,2,0,... over 12 hours: lag-1 acf = -1, lag-2 = +1 (up to
        # the finite-sample truncation of the estimator).
        rows = []
        eid = 0
        for h in range(12):
            for _ in range(2 if h % 2 == 0 else 0):
                rows.append(("a", _ts(h, m=eid % 50), eid))
                eid += 1
        df = spark.createDataFrame(rows, "grp string, ts timestamp, id long")
        out = {
            (r["grp"], r["lag"]): r["acf_bp"]
            for r in acf_by_group(df, "grp", "ts").collect()
        }
        # exact estimator: num_k/den with d_t = n*x_t - S. The dense
        # range is [first observed bucket, last observed bucket] — the
        # final zero hour (hour 11) has no events so the series length
        # is 11, not 12.
        xs = ([2, 0] * 6)[:11]
        n = len(xs)
        s = sum(xs)
        d = [n * x - s for x in xs]
        den = sum(v * v for v in d)
        for k in (1, 2, 3):
            num = sum(d[t] * d[t + k] for t in range(n - k))
            want = int(math.copysign(abs(num) * 10000 // den, num))
            assert out[("a", k)] == want
        assert out[("a", 1)] < 0 < out[("a", 2)]

    def test_missing_hours_are_zero_observations(self, spark):
        from dr_source_spark.operators.stats import acf_by_group

        # events only at hours 0 and 4: the dense series is length 5
        # (three explicit zeros), not length 2.
        df = spark.createDataFrame(
            [("a", _ts(0), 1), ("a", _ts(4), 2)],
            "grp string, ts timestamp, id long",
        )
        out = acf_by_group(df, "grp", "ts").collect()
        assert all(r["n_buckets"] == 5 for r in out)

    def test_constant_series_null_acf(self, spark):
        from dr_source_spark.operators.stats import acf_by_group

        # one event every hour: d_t = 0 everywhere, den = 0 -> NULL.
        df = spark.createDataFrame(
            [("a", _ts(h), h) for h in range(6)],
            "grp string, ts timestamp, id long",
        )
        out = acf_by_group(df, "grp", "ts").collect()
        assert out and all(r["acf_bp"] is None for r in out)


class TestMannWhitney:
    def test_complete_separation(self, spark):
        from dr_source_spark.operators.stats import mann_whitney_grid

        # side A all 10s, side B all 1s: U = n_a*n_b, u_bp = 10000,
        # rank-biserial = +10000.
        rows = [(True, 10)] * 3 + [(False, 1)] * 4
        df = spark.createDataFrame(rows, "side boolean, v long")
        r = mann_whitney_grid(df, F.col("side"), F.col("v")).collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 4)
        assert r["u2_a"] == 2 * 3 * 4
        assert r["u_bp"] == 10000 and r["rb_bp"] == 10000

    def test_all_ties(self, spark):
        from dr_source_spark.operators.stats import mann_whitney_grid

        # identical singleton values: u2 = n_a*n_b (all half-wins),
        # u_bp = 5000, rb = 0.
        rows = [(True, 7)] * 2 + [(False, 7)] * 5
        df = spark.createDataFrame(rows, "side boolean, v long")
        r = mann_whitney_grid(df, F.col("side"), F.col("v")).collect()[0]
        assert r["u2_a"] == 2 * 5
        assert r["u_bp"] == 5000 and r["rb_bp"] == 0

    def test_matches_brute_force(self, spark):
        from dr_source_spark.operators.stats import mann_whitney_grid

        a = [1, 3, 3, 8, 9]
        b = [2, 3, 5, 5]
        rows = [(True, v) for v in a] + [(False, v) for v in b]
        df = spark.createDataFrame(rows, "side boolean, v long")
        r = mann_whitney_grid(df, F.col("side"), F.col("v")).collect()[0]
        u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
        assert r["u2_a"] == u2
        assert r["u_bp"] == u2 * 10000 // (2 * len(a) * len(b))


class TestRollingBandOutliers:
    def test_spike_flagged_steady_not(self, spark):
        from dr_source_spark.operators.stats import rolling_band_outliers

        # 24 steady hours of 100 +/- 1 cents, then one 10x spike: the
        # spike is the only full-window outlier.
        rows = [("a", _ts(h), 100 + (h % 2)) for h in range(24)]
        rows.append(("a", _ts(24), 1000))
        rows.append(("a", _ts(25), 100))
        df = spark.createDataFrame(rows, "grp string, ts timestamp, cents long")
        out = rolling_band_outliers(
            df, "grp", "ts", F.col("cents"), window=24, k=2
        ).collect()
        flags = {r["bucket"].hour + 24 * (r["bucket"].day - 1): r["is_outlier"] for r in out}
        assert flags[24] is True
        assert flags[25] is False
        # short windows (first 24 hours) are not scored at all
        assert min(flags) == 24

    def test_exact_integer_identity(self, spark):
        from dr_source_spark.operators.stats import rolling_band_outliers

        vals = [3, 1, 4, 1, 5, 9, 2, 6]
        rows = [("a", _ts(h), v) for h, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, cents long")
        out = rolling_band_outliers(
            df, "grp", "ts", F.col("cents"), window=4, k=2
        ).collect()
        by_h = {r["bucket"].hour: r for r in out}
        for h in range(4, 8):
            wnd = vals[h - 4 : h]
            s, q, x = sum(wnd), sum(v * v for v in wnd), vals[h]
            dev2, band2 = (4 * x - s) ** 2, 4 * (4 * q - s * s)
            assert by_h[h]["is_outlier"] == (dev2 > band2)
            assert by_h[h]["excess_bp"] == min(
                dev2 * 10000 // max(band2, 1), 1000000
            )


class TestCohortMatrix:
    def test_planted_cohorts(self, spark):
        from dr_source_spark.operators.stats import cohort_matrix

        rows = [
            # cust 1: first in Jan, returns in Feb and Apr
            (1, dt.datetime(2024, 1, 5), 1000),
            (1, dt.datetime(2024, 2, 9), 2000),
            (1, dt.datetime(2024, 4, 1), 500),
            # cust 2: first in Jan only
            (2, dt.datetime(2024, 1, 20), 700),
            # cust 3: first in Feb, crosses the year boundary
            (3, dt.datetime(2024, 2, 2), 100),
            (3, dt.datetime(2025, 1, 2), 900),
        ]
        df = spark.createDataFrame(rows, "cust long, ts timestamp, rc long")
        out = {
            (r["cohort_month"], r["month_offset"]): (
                r["n_active"], r["n_events"], r["revenue_cents"]
            )
            for r in cohort_matrix(df, "cust", "ts", F.col("rc")).collect()
        }
        assert out[("2024-01", 0)] == (2, 2, 1700)
        assert out[("2024-01", 1)] == (1, 1, 2000)
        assert out[("2024-01", 3)] == (1, 1, 500)
        assert out[("2024-02", 0)] == (1, 1, 100)
        assert out[("2024-02", 11)] == (1, 1, 900)  # exact calendar months
        assert len(out) == 5


class TestResourceAllocation:
    def test_planted_wedge_scores(self, spark):
        from dr_source_spark.operators.graph import resource_allocation

        # star at z (deg 4) plus a leaf center w (deg 2): pair (a,b)
        # shares {z, w}, pairs (a,c)/(b,c)... share only z. Edges
        # themselves must never appear.
        edges = [
            ("z", "a"), ("z", "b"), ("z", "c"), ("z", "d"),
            ("w", "a"), ("w", "b"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = {
            (r["node_a"], r["node_b"]): (r["n_common"], r["ra_score_scaled"])
            for r in resource_allocation(df, min_common=1).collect()
        }
        # deg: z=4, w=2, a=2, b=2, c=1, d=1
        assert out[("a", "b")] == (2, 10000 // 4 + 10000 // 2)
        assert out[("a", "c")] == (1, 2500)
        assert out[("c", "d")] == (1, 2500)
        # (z, a) is an existing edge -> excluded even though they share
        # a common neighbor (b).
        assert ("a", "z") not in out and ("z", "a") not in out

    def test_hub_cap_drops_center(self, spark):
        from dr_source_spark.operators.graph import resource_allocation

        edges = [("z", c) for c in "abcd"] + [("w", "a"), ("w", "b")]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = {
            (r["node_a"], r["node_b"]): r["n_common"]
            for r in resource_allocation(
                df, min_common=1, max_hub_degree=3
            ).collect()
        }
        # z (deg 4) is capped away as a CENTER: (a, b) keeps only the
        # wedge at w, and (w, z) — non-adjacent, sharing the leaf
        # centers a and b — is the other surviving prediction.
        assert set(out) == {("a", "b"), ("w", "z")}
        assert out[("a", "b")] == 1
        assert out[("w", "z")] == 2


class TestWeightedBernoulliSample:
    def test_deterministic_and_weight_monotone(self, spark):
        from dr_source_spark.training.select import weighted_bernoulli_sample

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            (F.col("id") % 100 + 1).cast("long").alias("n_chars"),
        )
        a = weighted_bernoulli_sample(docs, "n_chars", target=300)
        b = weighted_bernoulli_sample(docs, "n_chars", target=300)
        ra = sorted(r["doc_id"] for r in a.collect())
        assert ra == sorted(r["doc_id"] for r in b.collect())  # same coin every run
        # expected size 300; binomial sd ~ 17 — accept a wide exact band
        assert 200 <= len(ra) <= 400
        # size bias: mean weight of the sample exceeds the corpus mean
        samp_mean = a.agg(F.avg("weight")).collect()[0][0]
        corp_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
        assert samp_mean > corp_mean

    def test_target_scales_inclusion(self, spark):
        from dr_source_spark.training.select import weighted_bernoulli_sample

        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.lit(10).cast("long").alias("n_chars"),
        )
        small = weighted_bernoulli_sample(docs, "n_chars", target=50).count()
        big = weighted_bernoulli_sample(docs, "n_chars", target=250).count()
        assert small < big
        # equal weights + target=250 over 500 docs: p = 1/2 each
        assert 180 <= big <= 320
