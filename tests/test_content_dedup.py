"""Analyze-once content dedup must be finding-identical to the plain
detector stage on a duplicate-heavy corpus."""

from pyspark.sql import functions as F

from dr_source_spark.kb import compile_kb, load_kb
from dr_source_spark.operators.analyze import run_detectors
from dr_source_spark.operators.content_dedup import run_detectors_content_deduped
from dr_source_spark.sources.corpus import ingest_source_files
from dr_source_spark.sources.synth import synth_code_corpus


def _key(r):
    return (r.repo, r.path, r.commit, r.line, r.vuln_type, r.message, r.severity,
            tuple(r.trace or []), r.rule_id, r.cwe, r.variable, r.sink, r.source, r.base_type)


def test_deduped_equals_plain_on_duplicated_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(F.col("doc_id") < 40)
    base = synth_code_corpus(docs)
    # 5 instances of every file under distinct repo/path identities
    dup = base
    for k in range(1, 5):
        dup = dup.unionByName(
            base.select(
                F.concat(F.lit(f"fork{k}_"), F.col("repo")).alias("repo"),
                F.concat(F.lit(f"vendor{k}/"), F.col("path")).alias("path"),
                "commit", "lang", "content",
            )
        )
    files = ingest_source_files(dup)
    ckb = compile_kb(load_kb(project_dir="/nonexistent"))

    plain = sorted(_key(r) for r in run_detectors(files, ckb).collect())
    deduped = sorted(_key(r) for r in run_detectors_content_deduped(files, ckb).collect())
    assert deduped == plain and len(plain) > 0


def test_same_content_different_ext_not_merged(spark):
    # identical bytes under .py and .cfg must keep per-ext behavior (the
    # dedup key is (ext, sha256), never sha alone)
    content = (
        "import os\nfrom flask import request\nc = request.args.get('x')\nos.system(c)\n"
        "password = 'supersecretvalue'\n"
    )
    files = ingest_source_files(
        spark.createDataFrame(
            [("r", "a.py", "c", None, content), ("r", "b.cfg", "c", None, content)],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    assert files.count() == 2  # .cfg is not an ignored extension
    ckb = compile_kb(load_kb(project_dir="/nonexistent"))
    out = run_detectors_content_deduped(files, ckb).collect()
    py_ast = [r for r in out if r.path == "a.py" and r.vuln_type.endswith("(AST Taint)")]
    cfg_ast = [r for r in out if r.path == "b.cfg" and r.vuln_type.endswith("(AST Taint)")]
    cfg_regex = [r for r in out if r.path == "b.cfg" and r.plugin == "General Regex Analyzer"]
    assert py_ast and not cfg_ast  # AST tier only runs for .py
    assert cfg_regex  # the general regex tier still fires on .cfg
