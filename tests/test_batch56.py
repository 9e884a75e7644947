"""Batch-56 operators on hand-computed fixtures: severity × language
matrix (operators/triples.py), quality × duplication interaction audit
(training/curate.py), and the shared license_expr refactor."""

from pyspark.sql import functions as F


# -------------------------------------------------------------- severity_by_lang

def test_severity_by_lang_hand_computed(spark):
    from dr_source_spark.operators.triples import severity_by_lang

    files = spark.createDataFrame(
        [("r", "a.py", "python"), ("r", "b.py", "python"), ("r", "c.java", "java")],
        "repo string, path string, lang string",
    )
    findings = spark.createDataFrame(
        [
            ("r", "a.py", "HIGH"), ("r", "a.py", "HIGH"), ("r", "b.py", "MEDIUM"),
            ("r", "c.java", "CRITICAL"),
        ],
        "repo string, path string, severity string",
    )
    out = {(r["lang"], r["severity"]): r
           for r in severity_by_lang(files, findings).collect()}
    # python: 2 HIGH + 1 MEDIUM -> row-normalized 6666 / 3333 bp
    assert (out[("python", "HIGH")]["n_findings"],
            out[("python", "HIGH")]["lang_share_bp"]) == (2, 6666)
    assert out[("python", "MEDIUM")]["lang_share_bp"] == 3333
    assert out[("java", "CRITICAL")]["lang_share_bp"] == 10000


# ------------------------------------------------------- quality_dup_interaction

def test_quality_dup_interaction_hand_computed(spark):
    from dr_source_spark.training.curate import quality_dup_interaction

    good = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (0, good),                 # kept, dup family (with 1 and 2)
        (1, good),                 # kept, dup (same text)
        (2, "THE  quick brown fox jumps over the lazy dog today"),  # normalizes into the family
        (3, "unique doc with the and of and to and in words here"),  # kept, not dup
        (4, "tiny"),               # too_short, not dup
        (5, None),                 # NULL -> too_short, not dup (empty fp family of 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["quality_reason"], r["is_dup"]): r
           for r in quality_dup_interaction(df).collect()}
    assert out[("kept", True)]["n_docs"] == 3
    assert out[("kept", False)]["n_docs"] == 1
    assert out[("too_short", False)]["n_docs"] == 2
    assert sum(r["n_docs"] for r in out.values()) == 6
    # shares: 5000 + 1666 + 3333 bp
    assert out[("kept", True)]["share_bp"] == 5000


def test_quality_dup_interaction_null_joins_empty_family(spark):
    from dr_source_spark.training.curate import quality_dup_interaction

    # NULL and "" normalize to the same fingerprint -> a dup family
    rows = [(0, None), (1, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["quality_reason"], r["is_dup"]): r["n_docs"]
           for r in quality_dup_interaction(df).collect()}
    assert out == {("too_short", True): 2}


# ------------------------------------------------------------------ license_expr

def test_license_expr_shared_with_screen(spark):
    from dr_source_spark.training.text import license_expr, license_screen

    df = spark.createDataFrame(
        [(0, "py", "Licensed under the Apache License 2.0")],
        "doc_id long, lang string, text string",
    )
    direct = df.select(license_expr().alias("license")).collect()[0]["license"]
    via_screen = license_screen(df).collect()[0]["license"]
    assert direct == via_screen == "apache-2.0"
