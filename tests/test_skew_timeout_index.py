"""Skew-bucket repartitioning (R9), per-file timeout (A5/R5), symbol-index
last-wins (A4), python inter-file extension (B7)."""

import pytest
from pyspark.sql import functions as F


def test_repo_size_buckets_and_spread(spark):
    from dr_source_spark.operators.skew import repartition_by_size_buckets, repo_size_buckets
    from dr_source_spark.sources.synth import synth_code_corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    files = synth_code_corpus(docs)  # heavy-tailed: repo k owns ~2k+1 files
    buckets = {r.repo: r.bucket for r in repo_size_buckets(files, medium=30, large=40).collect()}
    assert "small" in buckets.values() and "large" in buckets.values()

    out = repartition_by_size_buckets(files, 16, medium=30, large=40)
    assert out.count() == files.count()
    # the largest repo spans multiple partitions
    big_repo = max(buckets, key=lambda r: 1 if buckets[r] == "large" else 0)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("repo") == big_repo)
        .select("pid").distinct().count()
    )
    assert parts > 1, "large repo should be spread over multiple partitions"


def test_salted_group_count_matches_plain(spark):
    from dr_source_spark.operators.skew import salted_group_count

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plain = {(r.event_type): r.n for r in ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n")).collect()}
    salted = {(r.event_type): r.n for r in salted_group_count(ev, ["event_type"]).collect()}
    assert plain == salted


def test_per_file_timeout_drops_findings(spark, fixture_corpus):
    from dr_source_spark.kb import compile_kb, load_kb
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.sources.corpus import ingest_source_files

    ckb = compile_kb(load_kb(project_dir="/nonexistent"))
    files = ingest_source_files(fixture_corpus)
    # an impossible budget: every file's AST tier hits the deadline → the
    # timed-out file contributes nothing (reference scanner.py:186-188),
    # but the regex tier (before the first deadline check) already ran —
    # so the reference-exact semantics is all-or-nothing per file
    n_normal = run_detectors(files, ckb).count()
    n_timeout = run_detectors(files, ckb, per_file_timeout_s=1e-9).count()
    assert n_timeout == 0 < n_normal


def test_symbol_index_last_wins(spark):
    from dr_source_spark.operators.index_build import build_symbol_index
    from dr_source_spark.sources.corpus import ingest_source_files

    df = spark.createDataFrame(
        [
            ("r", "a/util.js", "c", None, "function helper(x) { return 1; }"),
            ("r", "z/util.js", "c", None, "function helper(y) { return 2; }"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = build_symbol_index(ingest_source_files(df)).collect()
    helpers = [r for r in idx if r["name"] == "helper"]
    assert len(helpers) == 1
    # deterministic last-wins: lexicographically last path survives
    assert helpers[0]["path"] == "z/util.js" and helpers[0]["params"] == ["y"]


def test_python_interfile_extension(spark):
    """The stock reference never wires a project index into the Python tier
    (SURVEY.md §2B B7); our engine supports it as an opt-in extension."""
    from dr_source_spark.detectors.python_taint import analyze_python
    from dr_source_spark.kb import compile_kb, load_kb

    ckb = compile_kb(load_kb(project_dir="/nonexistent"))
    utils = open("/root/reference/tests/test_code/inter_file/python/inter_file_utils.py").read()
    app = open("/root/reference/tests/test_code/inter_file/python/inter_file_app.py").read()

    import ast as pyast

    idx = {}
    tree = pyast.parse(utils)
    for node in pyast.walk(tree):
        if isinstance(node, pyast.FunctionDef):
            idx[node.name] = {
                "lang": "python",
                "path": "inter_file_utils.py",
                "def_source": pyast.get_source_segment(utils, node),
                "def_line": node.lineno,
                "params": [a.arg for a in node.args.args],
            }

    # parity mode: no index → no cross-file finding
    assert analyze_python(app, ckb.taint["python"]) == []
    # extension mode: taint flows into the callee
    hits = analyze_python(app, ckb.taint["python"], fn_index=idx)
    cmd = [f for f in hits if f["base_type"] == "COMMAND_INJECTION"]
    assert cmd and any("in inter_file_utils.py" in s for s in cmd[0]["trace"])
    assert cmd[0]["sink"] == "os.system"
