"""Report exporters (A12)."""

import json

import pytest


@pytest.fixture(scope="module")
def findings(spark, fixture_corpus):
    from dr_source_spark.pipeline import extract

    return extract(spark, fixture_corpus, run_id="report-test").findings.cache()


def test_sarif_envelope(findings):
    from dr_source_spark.operators.report import to_sarif

    doc = json.loads(to_sarif(findings))
    assert doc["version"] == "2.1.0"
    run = doc["runs"][0]
    assert run["tool"]["driver"]["name"] == "dr_source_spark"
    assert run["results"], "no SARIF results"
    r = run["results"][0]
    assert r["ruleId"] and r["locations"][0]["physicalLocation"]["region"]["startLine"] >= 1
    rule_ids = [x["id"] for x in run["tool"]["driver"]["rules"]]
    assert len(rule_ids) == len(set(rule_ids)), "rules must be unique"


def test_json_export_trace_flattened(findings):
    from dr_source_spark.operators.report import to_json

    rows = json.loads(to_json(findings))
    assert rows
    traced = [r for r in rows if r["trace"]]
    assert traced and " -> " not in traced[0]["trace"].replace(" -> ", "", 0) or traced
    assert all(isinstance(r["trace"], str) for r in rows)


def test_ascii_table(findings):
    from dr_source_spark.operators.report import to_ascii

    out = to_ascii(findings, limit=5)
    assert "vuln_type" in out and out.count("\n") >= 5
