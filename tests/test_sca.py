"""SCA enrichment join (B12) over the reference's deps fixtures."""

import pytest


@pytest.fixture(scope="module")
def deps_corpus(spark):
    from dr_source_spark.sources.corpus import corpus_from_dir

    # deps fixtures are .txt/.xml — unreachable via directory-scan ignore
    # rules (reference scanner.py:49 quirk) → load with rules off, as the
    # reference does for single-file targets
    return corpus_from_dir(
        spark, "/root/reference/tests/test_code/deps", repo="deps", commit="v1", apply_ignore_rules=False
    )


def test_parse_requirements(spark, deps_corpus):
    from dr_source_spark.operators.sca import parse_requirements

    rows = {(r.package, r.version) for r in parse_requirements(deps_corpus).collect()}
    assert rows, "no pinned requirements parsed"
    assert all(p == p.lower() for p, _ in rows)


def test_parse_pom(spark, deps_corpus):
    from dr_source_spark.operators.sca import parse_pom

    rows = {(r.package, r.version) for r in parse_pom(deps_corpus).collect()}
    assert rows, "no pom dependencies parsed"
    assert all(":" in p for p, _ in rows)


def test_sca_findings_join(spark, deps_corpus):
    from dr_source_spark.operators.sca import parse_requirements, sca_findings

    deps = parse_requirements(deps_corpus)
    first = deps.first()
    advisories = spark.createDataFrame(
        [(first.package, first.version, "OSV-TEST-1", "high", "test advisory")],
        "package string, version string, advisory_id string, severity string, summary string",
    )
    out = sca_findings(deps, advisories).collect()
    assert len(out) == 1
    f = out[0]
    assert f.vuln_type == "VULNERABLE_DEPENDENCY" and f.severity == "HIGH"
    assert "OSV-TEST-1" in f.message


def test_catalog_parquet_roundtrip(spark, tmp_path_factory):
    from dr_source_spark.sources.catalog import read_table, write_table

    out = str(tmp_path_factory.mktemp("catalog")) + "/t"
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn("k", (F.col("id") % 2).cast("string"))
    write_table(df, out, mode="overwrite", partition_by=["k"])
    back = read_table(spark, out)
    assert back.count() == 10 and set(back.columns) == {"id", "k"}
