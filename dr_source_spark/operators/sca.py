"""Dependency / SCA scan as a relational enrichment join (SURVEY.md §2B B12).

The reference shells out to pip-audit and calls the OSV network API per file
(plugins/dependency/plugin.py:39-170) — side effects a distributed engine
must not perform per-row. The scale-correct shape: parse manifests into a
(package, version) table with JVM-side string functions, then broadcast-join
a pre-fetched OSV advisory snapshot table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQ_LINE = r"^\s*([A-Za-z0-9._-]+)\s*==\s*([A-Za-z0-9.+!*-]+)"


def parse_requirements(files_df: DataFrame) -> DataFrame:
    """requirements.txt rows → (repo, path, commit, package, version).
    Only pinned `pkg==ver` lines carry enough signal to match advisories
    (same restriction as pip-audit's resolved set)."""
    reqs = files_df.filter(F.col("path").rlike(r"(^|/)requirements[^/]*\.txt$"))
    lines = reqs.select(
        "repo", "path", "commit",
        F.explode(F.split(F.col("content"), "\n")).alias("line"),
    )
    return (
        lines.withColumn("package", F.lower(F.regexp_extract("line", REQ_LINE, 1)))
        .withColumn("version", F.regexp_extract("line", REQ_LINE, 2))
        .filter(F.col("package") != "")
        .drop("line")
    )


def parse_pom(files_df: DataFrame) -> DataFrame:
    """pom.xml rows → (repo, path, commit, package 'group:artifact', version).
    Regex-level extraction of <dependency> blocks (no executor-side XML libs
    needed for the common well-formed case)."""
    poms = files_df.filter(F.col("path").rlike(r"(^|/)pom\.xml$"))
    dep_block = F.explode(
        F.expr(r"regexp_extract_all(content, '(?s)<dependency>(.*?)</dependency>', 1)")
    ).alias("dep")
    deps = poms.select("repo", "path", "commit", dep_block)
    g = F.regexp_extract("dep", r"<groupId>\s*([^<]+?)\s*</groupId>", 1)
    a = F.regexp_extract("dep", r"<artifactId>\s*([^<]+?)\s*</artifactId>", 1)
    v = F.regexp_extract("dep", r"<version>\s*([^<]+?)\s*</version>", 1)
    return (
        deps.select("repo", "path", "commit", F.concat_ws(":", g, a).alias("package"), v.alias("version"))
        .filter((F.col("package") != "") & (F.col("version") != ""))
    )


def sca_findings(dependencies: DataFrame, advisories: DataFrame) -> DataFrame:
    """Broadcast-join dependencies against an advisory snapshot
    (package, version, advisory_id, severity, summary) → VULNERABLE_DEPENDENCY
    findings (reference emits these with plugin 'Dependency Analyzer')."""
    adv = F.broadcast(advisories)
    hits = dependencies.join(adv, ["package", "version"], "inner")
    return hits.select(
        "repo", "path", "commit",
        F.lit("VULNERABLE_DEPENDENCY").alias("vuln_type"),
        F.concat_ws("", F.lit("("), F.col("advisory_id"), F.lit(") "),
                    F.col("package"), F.lit("=="), F.col("version"), F.lit(": "), F.col("summary")).alias("message"),
        F.upper(F.coalesce(F.col("severity"), F.lit("MEDIUM"))).alias("severity"),
        F.lit(1).alias("line"),
        F.lit("Dependency Analyzer").alias("plugin"),
        F.array().cast("array<string>").alias("trace"),
        F.col("advisory_id").alias("rule_id"),
        F.lit(None).cast("string").alias("cwe"),
    )
