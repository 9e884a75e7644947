"""Exact evaluation metrics (training/evalmetrics.py) and audit
operators (operators/stats.py: drift_chi2, benford_profile) on
hand-computed fixtures."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------------ AUC

def test_auc_perfect_inverted_and_tied(spark):
    from dr_source_spark.training.evalmetrics import auc_by_group

    rows = [("perfect", 1, 0), ("perfect", 2, 0), ("perfect", 3, 1), ("perfect", 4, 1)]
    rows += [("inverted", 1, 1), ("inverted", 2, 1), ("inverted", 3, 0), ("inverted", 4, 0)]
    # ties: scores [1,1,2], labels [0,1,1] -> pairs: (tie 0.5) + (win 1) over 2 -> 0.75
    rows += [("tied", 1, 0), ("tied", 1, 1), ("tied", 2, 1)]
    rows += [("degenerate", 5, 1)]  # no negatives -> NULL
    df = spark.createDataFrame(rows, "grp string, s long, y long")
    out = {
        r.grp: (r.n_pos, r.n_neg, r.auc_bp)
        for r in auc_by_group(df, "grp", F.col("s"), F.col("y")).collect()
    }
    assert out == {
        "perfect": (2, 2, 10000),
        "inverted": (2, 2, 0),
        "tied": (2, 1, 7500),
        "degenerate": (1, 0, None),
    }


# ------------------------------------------------------- pr_at_thresholds

def test_pr_sweep_hand_computed(spark):
    from dr_source_spark.training.evalmetrics import pr_at_thresholds

    # scores 1..10, positives at 7..10; decile thresholds are 2..10
    df = spark.createDataFrame(
        [(s, 1 if s >= 7 else 0) for s in range(1, 11)], "s long, y long"
    )
    out = {
        r.cut: (r.threshold, r.tp, r.fp, r.fn, r.precision_bp, r.recall_bp, r.f1_bp)
        for r in pr_at_thresholds(df, F.col("s"), F.col("y")).collect()
    }
    assert len(out) == 9
    # cut 1: th=2 -> predict s>=2: tp=4 fp=5 fn=0; F1 = 8/(8+5+0)
    assert out[1] == (2, 4, 5, 0, 4444, 10000, 6153)
    # cut 6: th=7 -> exactly the positives: perfect
    assert out[6] == (7, 4, 0, 0, 10000, 10000, 10000)
    # cut 9: th=10 -> tp=1 fp=0 fn=3; F1 = 2/(2+0+3)
    assert out[9] == (10, 1, 0, 3, 10000, 2500, 4000)


def test_pr_sweep_duplicate_thresholds_keep_cut_rows(spark):
    from dr_source_spark.training.evalmetrics import pr_at_thresholds

    # constant score: every decile threshold is the same value; the
    # sweep still emits 9 keyed rows, all predicting everything positive
    df = spark.createDataFrame([(5, i % 2) for i in range(10)], "s long, y long")
    rows = pr_at_thresholds(df, F.col("s"), F.col("y")).collect()
    assert len(rows) == 9
    assert all((r.threshold, r.tp, r.fp, r.recall_bp) == (5, 5, 5, 10000) for r in rows)


# --------------------------------------------------------------- kappa

def test_kappa_perfect_chance_inverse_undefined(spark):
    from dr_source_spark.training.evalmetrics import cohens_kappa

    rows = [("perfect", a, a) for a in (1, 1, 0, 0)]
    rows += [("chance", 1, 1), ("chance", 1, 0), ("chance", 0, 1), ("chance", 0, 0)]
    rows += [("inverse", 1, 0), ("inverse", 1, 0), ("inverse", 0, 1), ("inverse", 0, 1)]
    rows += [("degenerate", 1, 1), ("degenerate", 1, 1)]  # both constant
    df = spark.createDataFrame(rows, "grp string, a long, b long")
    out = {
        r.grp: (r.n_rows, r.n_agree, r.agree_bp, r.kappa_bp)
        for r in cohens_kappa(df, "grp", F.col("a"), F.col("b")).collect()
    }
    assert out == {
        "perfect": (4, 4, 10000, 10000),
        "chance": (4, 2, 5000, 0),
        "inverse": (4, 0, 0, -10000),
        "degenerate": (2, 2, 10000, None),
    }


# ---------------------------------------------------------- drift_chi2

def test_drift_chi2_classic_2x2(spark):
    from dr_source_spark.operators.stats import drift_chi2

    # x: 3 early / 1 late; y: 1 early / 3 late. N=8, all marginals 4:
    # every cell contributes (8*O-16)^2*10^4 // 128 = 5000 -> 10000/cat
    base = dt.datetime(2024, 1, 1)
    rows = [("x", base + dt.timedelta(seconds=s)) for s in (0, 10, 20, 80)]
    rows += [("y", base + dt.timedelta(seconds=s)) for s in (30, 60, 90, 100)]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = {
        r.cat: (r.n_early, r.n_late, r.chi2_x10000)
        for r in drift_chi2(df, "cat").collect()
    }
    assert out == {"x": (3, 1, 10000), "y": (1, 3, 10000)}


def test_drift_chi2_category_absent_from_one_period(spark):
    from dr_source_spark.operators.stats import drift_chi2

    base = dt.datetime(2024, 1, 1)
    rows = [("only_early", base), ("filler", base + dt.timedelta(seconds=100))]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = {r.cat: (r.n_early, r.n_late) for r in drift_chi2(df, "cat").collect()}
    # the O=0 cells exist (no dropped categories) and counts densify to 0
    assert out == {"only_early": (1, 0), "filler": (0, 1)}


# ------------------------------------------------------ benford_profile

def test_benford_profile_hand_computed(spark):
    from dr_source_spark.operators.stats import benford_profile

    # positives 1, 19.99 (floors to 19), 25, 3; zero/negative excluded
    df = spark.createDataFrame(
        [(1.0,), (19.99,), (25.0,), (3.0,), (0.0,), (-5.0,)], "v double"
    )
    out = {
        r.digit: (r.n_rows, r.share_bp, r.benford_bp, r.dev_bp)
        for r in benford_profile(df, F.col("v")).collect()
    }
    assert out == {
        1: (2, 5000, 3010, 1990),
        2: (1, 2500, 1760, 740),
        3: (1, 2500, 1249, 1251),
    }
