"""Knowledge-graph projection: findings → triples, nodes, edges.

Pure relational (JVM-side, codegen): no UDFs. Predicates per SURVEY.md §1.3:

* (repo:path@commit,        HAS_VULN,     CWE-xxx)        — every finding with a CWE
* (repo:path@commit#line,   MATCHES_RULE, rule_id)        — regex-tier findings
* (file#var:variable,       TAINTED_BY,   source descr.)  — taint findings
* (file#var:variable,       FLOWS_TO,     sink@line)      — taint findings
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def file_uri(repo="repo", path="path", commit="commit"):
    return F.concat_ws("", F.col(repo), F.lit(":"), F.col(path), F.lit("@"), F.col(commit))


def findings_to_triples(findings: DataFrame, run_id: str = "run-0") -> DataFrame:
    base = findings.withColumn("file_uri", file_uri())
    line_uri = F.concat_ws("", F.col("file_uri"), F.lit("#L"), F.col("line"))
    var_uri = F.concat_ws("", F.col("file_uri"), F.lit("#var:"), F.col("variable"))

    has_vuln = (
        base.filter(F.col("cwe").isNotNull())
        .select(
            F.col("file_uri").alias("subj"),
            F.lit("HAS_VULN").alias("pred"),
            F.col("cwe").alias("obj"),
            F.col("line"),
            F.col("trace"),
        )
    )
    matches_rule = (
        base.filter(F.col("rule_id").isNotNull())
        .select(
            line_uri.alias("subj"),
            F.lit("MATCHES_RULE").alias("pred"),
            F.col("rule_id").alias("obj"),
            F.col("line"),
            F.col("trace"),
        )
    )
    tainted_by = (
        base.filter(F.col("variable").isNotNull() & F.col("source").isNotNull())
        .select(
            var_uri.alias("subj"),
            F.lit("TAINTED_BY").alias("pred"),
            F.col("source").alias("obj"),
            F.col("line"),
            F.col("trace"),
        )
    )
    flows_to = (
        base.filter(F.col("variable").isNotNull() & F.col("sink").isNotNull())
        .select(
            var_uri.alias("subj"),
            F.lit("FLOWS_TO").alias("pred"),
            F.concat_ws("", F.col("sink"), F.lit("@L"), F.col("line")).alias("obj"),
            F.col("line"),
            F.col("trace"),
        )
    )
    return (
        has_vuln.unionByName(matches_rule).unionByName(tainted_by).unionByName(flows_to)
        .withColumn("run_id", F.lit(run_id))
    )


def triples_to_nodes_edges(triples: DataFrame):
    """Canonicalized node/edge tables. distinct() is a hash-aggregate shuffle
    on already-narrow columns; AQE coalesces the post-shuffle partitions."""
    subj = triples.select(F.col("subj").alias("node_id"))
    obj = triples.select(F.col("obj").alias("node_id"))
    nodes = (
        subj.unionByName(obj)
        .distinct()
        .withColumn(
            "kind",
            F.when(F.col("node_id").rlike("#var:"), F.lit("entity"))
            .when(F.col("node_id").rlike("#L[0-9]+$"), F.lit("file_line"))
            .when(F.col("node_id").rlike("^CWE-"), F.lit("cwe"))
            .when(F.col("node_id").rlike("@L[0-9]+$"), F.lit("sink"))
            .when(F.col("node_id").rlike(":.*@"), F.lit("file"))
            .otherwise(F.lit("rule")),
        )
        .withColumn("label", F.col("node_id"))
    )
    edges = triples.select(
        F.col("subj").alias("src"), F.col("pred"), F.col("obj").alias("dst"), F.col("line")
    ).distinct()
    return nodes, edges
