"""Batch-51 operators on hand-computed fixtures: per-repo risk
scorecard (operators/relational.py), monthly activity streaks
(operators/mining.py), license-header census (training/text.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------- repo_risk_scores

def test_repo_risk_hand_computed(spark):
    from dr_source_spark.operators.relational import repo_risk_scores

    rows = [
        # repo A: CRITICAL + HIGH in one file, MEDIUM in another
        ("A", "f1", "CRITICAL"), ("A", "f1", "HIGH"), ("A", "f2", "MEDIUM"),
        # repo B: two LOW in one file; UNKNOWN floors at weight 1
        ("B", "g1", "LOW"), ("B", "g1", "LOW"), ("B", "g1", "UNKNOWN"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, severity string")
    out = {r["repo"]: r for r in repo_risk_scores(df).collect()}
    a = out["A"]
    assert (a["n_findings"], a["n_files"], a["risk_score"]) == (3, 2, 15)
    b = out["B"]
    assert (b["n_findings"], b["n_files"], b["risk_score"]) == (3, 1, 3)
    assert (a["risk_rank"], b["risk_rank"]) == (1, 2)


def test_repo_risk_rank_tiebreak(spark):
    from dr_source_spark.operators.relational import repo_risk_scores

    rows = [("B", "f", "LOW"), ("A", "g", "LOW")]
    df = spark.createDataFrame(rows, "repo string, path string, severity string")
    out = {r["repo"]: r["risk_rank"] for r in repo_risk_scores(df).collect()}
    assert out == {"A": 1, "B": 2}  # equal risk -> repo asc


# -------------------------------------------------------------- monthly_streaks

def test_monthly_streaks_hand_computed(spark):
    from dr_source_spark.operators.mining import monthly_streaks

    rows = [
        # c1: Jan, Feb, Mar 2024 + Dec 2023 -> one 4-month run
        # (Dec 2023 = midx 24287, Jan 2024 = 24289? no: 2023*12+12 and
        # 2024*12+1 ARE consecutive integers) ... two orders in Feb
        # must collapse to one active month.
        (1, 1, dt.datetime(2023, 12, 5)), (2, 1, dt.datetime(2024, 1, 7)),
        (3, 1, dt.datetime(2024, 2, 2)), (4, 1, dt.datetime(2024, 2, 20)),
        (5, 1, dt.datetime(2024, 3, 9)),
        # c2: Jan and Mar (gap in Feb) -> two 1-month runs
        (6, 2, dt.datetime(2024, 1, 1)), (7, 2, dt.datetime(2024, 3, 1)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    out = {r["o_custkey"]: r for r in monthly_streaks(df).collect()}
    c1 = out[1]
    assert (c1["n_active_months"], c1["n_streaks"], c1["max_streak_months"]) == (4, 1, 4)
    c2 = out[2]
    assert (c2["n_active_months"], c2["n_streaks"], c2["max_streak_months"]) == (2, 2, 1)


def test_monthly_streaks_year_boundary_not_consecutive_to_feb(spark):
    from dr_source_spark.operators.mining import monthly_streaks

    # Dec 2023 and Feb 2024: midx gap of 2 -> two separate streaks
    rows = [
        (1, 1, dt.datetime(2023, 12, 31)),
        (2, 1, dt.datetime(2024, 2, 1)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    r = monthly_streaks(df).collect()[0]
    assert (r["n_streaks"], r["max_streak_months"]) == (2, 1)


# --------------------------------------------------------------- license_screen

def test_license_screen_priority_and_rollup(spark):
    from dr_source_spark.training.text import license_screen

    rows = [
        # MIT grant sentence wins even though 'apache license' also appears
        (0, "py", "Permission is hereby granted, free of charge ... "
                  "see also the Apache License"),
        (1, "py", "Licensed under the Apache License, Version 2.0"),
        (2, "go", "This file is part of X, under the GNU General Public License."),
        (3, "go", "GNU Lesser General Public License v2.1"),
        (4, "py", "no license text at all"),
        (5, "py", None),  # NULL text -> 'none'
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r["lang"], r["license"]): r for r in license_screen(df).collect()}
    assert out[("py", "mit")]["n_docs"] == 1
    assert out[("py", "apache-2.0")]["n_docs"] == 1
    assert out[("go", "gpl")]["n_docs"] == 1
    # LGPL must NOT be swallowed by the GPL substring match
    assert out[("go", "lgpl")]["n_docs"] == 1
    assert out[("py", "none")]["n_docs"] == 2
    assert out[("py", "none")]["total_chars"] == len("no license text at all")
