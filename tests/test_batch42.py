"""Batch-42 operators on hand-computed fixtures: hierarchical path
rollup (operators/relational.path_rollup), event trigram census
(operators/relational.trigram_paths), co-occurrence lift
(operators/relational.cooccurrence_lift)."""

import datetime as dt

from pyspark.sql import functions as F


# ---------------------------------------------------------------- path_rollup

def _findings(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, vuln_type string, severity string"
    )


def test_path_rollup_subtree_credit(spark):
    from dr_source_spark.operators.relational import path_rollup

    f = _findings(
        spark,
        [
            ("r", "src/a/x.py", "SQLI", "CRITICAL"),
            ("r", "src/a/x.py", "XSS", "HIGH"),
            ("r", "src/b/y.py", "SQLI", "CRITICAL"),
            ("r", "conf/z.ini", "SECRET", "LOW"),
            ("r", "Main.java", "XSS", "HIGH"),  # no directory: no rows
        ],
    )
    out = {r["dir"]: r for r in path_rollup(f).collect()}
    assert sorted(out) == ["conf", "src", "src/a", "src/b"]
    assert (out["src"]["depth"], out["src"]["n_findings"], out["src"]["n_files"],
            out["src"]["n_critical"]) == (1, 3, 2, 2)
    assert (out["src/a"]["depth"], out["src/a"]["n_findings"],
            out["src/a"]["n_files"], out["src/a"]["n_critical"]) == (2, 2, 1, 1)
    assert out["conf"]["n_critical"] == 0


def test_path_rollup_distinct_files_across_repos(spark):
    from dr_source_spark.operators.relational import path_rollup

    # same path in two repos = two distinct files under the same dir
    f = _findings(
        spark,
        [("r1", "src/x.py", "SQLI", "LOW"), ("r2", "src/x.py", "SQLI", "LOW")],
    )
    r = path_rollup(f).collect()[0]
    assert (r["dir"], r["n_files"], r["n_findings"]) == ("src", 2, 2)


# -------------------------------------------------------------- trigram_paths

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1, 0, i, 0)


def test_trigram_counts_and_share(spark):
    from dr_source_spark.operators.relational import trigram_paths

    # user 1 stream a b a b a -> trigrams (a,b,a), (b,a,b), (a,b,a)
    rows = [(i, _ts(i), 1, t) for i, t in enumerate("ababa")]
    out = {
        (r["t1"], r["t2"], r["t3"]): (r["n"], r["share_bp"])
        for r in trigram_paths(_ev(spark, rows)).collect()
    }
    assert out == {("a", "b", "a"): (2, 6666), ("b", "a", "b"): (1, 3333)}


def test_trigram_never_crosses_users(spark):
    from dr_source_spark.operators.relational import trigram_paths

    # two users with 2 events each: no user reaches 3 -> empty
    rows = [
        (0, _ts(0), 1, "a"),
        (1, _ts(1), 1, "b"),
        (2, _ts(0), 2, "c"),
        (3, _ts(1), 2, "d"),
    ]
    assert trigram_paths(_ev(spark, rows)).count() == 0


# --------------------------------------------------------- cooccurrence_lift

def test_lift_independence_and_clustering(spark):
    from dr_source_spark.operators.relational import cooccurrence_lift

    # 4 files: f1{A,B}, f2{A,B}, f3{A}, f4{B} -> N=4, n_A=3, n_B=3,
    # n_AB=2 -> lift = 10000*4*2 div 9 = 8888 (slightly repelling).
    f = _findings(
        spark,
        [
            ("r", "f1", "A", "LOW"),
            ("r", "f1", "B", "LOW"),
            ("r", "f2", "A", "LOW"),
            ("r", "f2", "B", "LOW"),
            ("r", "f3", "A", "LOW"),
            ("r", "f4", "B", "LOW"),
        ],
    )
    r = cooccurrence_lift(f).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["type_a"], row["type_b"]) == ("A", "B")
    assert (row["n_both"], row["n_a"], row["n_b"], row["n_total"]) == (2, 3, 3, 4)
    assert row["lift_bp"] == 8888


def test_lift_duplicate_findings_counted_once(spark):
    from dr_source_spark.operators.relational import cooccurrence_lift

    # f1 has A twice and B once: the distinct base makes n_AB=1, n_A=1.
    # N=2 (f2 only carries C, which pairs with nothing).
    f = _findings(
        spark,
        [
            ("r", "f1", "A", "LOW"),
            ("r", "f1", "A", "HIGH"),
            ("r", "f1", "B", "LOW"),
            ("r", "f2", "C", "LOW"),
        ],
    )
    r = cooccurrence_lift(f).collect()
    assert len(r) == 1
    row = r[0]
    # lift = 10000*2*1 div (1*1) = 20000: A and B always co-occur
    assert (row["n_both"], row["n_a"], row["n_b"], row["n_total"], row["lift_bp"]) == (
        1, 1, 1, 2, 20000,
    )
