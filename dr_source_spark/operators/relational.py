"""Relational operators around the findings store (SURVEY.md §2A A6, A8-A10).

Generic over any DataFrame so the driver harness can exercise them on the
synthetic tables; the pipeline applies them to findings/scan runs.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_findings(findings: DataFrame, key: Sequence[str] = ("path", "line", "vuln_type", "message")) -> DataFrame:
    """A6 — global finding dedup (reference scanner.py:158,176-180).
    Plain dropDuplicates: Catalyst plans a hash aggregate with map-side
    partial dedup; AQE handles post-shuffle coalescing."""
    return findings.dropDuplicates(list(key))


def dedup_findings_salted(
    findings: DataFrame,
    key: Sequence[str] = ("path", "line", "vuln_type", "message"),
    salt_buckets: int = 16,
) -> DataFrame:
    """A6 under heavy key skew (mega-repos): two-phase salted dedup — salt
    the groupBy key, drop duplicates per salted group, then a final dedup on
    the true key. Phase 1 spreads a hot key over `salt_buckets` reducers."""
    salted = findings.withColumn("_salt", F.pmod(F.hash(*[F.col(c) for c in key]), F.lit(salt_buckets)))
    phase1 = salted.dropDuplicates(list(key) + ["_salt"])
    return phase1.dropDuplicates(list(key)).drop("_salt")


def scan_diff(curr: DataFrame, prev: DataFrame, key: Sequence[str]) -> dict:
    """A9 — new/resolved/persistent sets between two runs
    (reference db.py:191-219 set algebra → anti/semi joins)."""
    kl = list(key)
    c = curr.select(kl).distinct()
    p = prev.select(kl).distinct()
    return {
        "new": c.join(p, kl, "left_anti"),
        "resolved": p.join(c, kl, "left_anti"),
        "persistent": c.join(p, kl, "left_semi"),
    }


def run_summary(findings: DataFrame, run_col: str = "run_id") -> DataFrame:
    """A8 — per-run scan summary (reference db.py:154-169)."""
    return findings.groupBy(run_col).agg(
        F.count("*").alias("num_vulnerabilities"),
        F.countDistinct("path").alias("num_files_with_findings"),
    )


def severity_histogram(findings: DataFrame) -> DataFrame:
    """A8 — severity histogram (reference cli.py:244-249)."""
    return findings.groupBy("severity").agg(F.count("*").alias("n"))


def latest_per_group(df: DataFrame, group: Sequence[str], order: List) -> DataFrame:
    """A10 — latest-scan-per-project pattern (reference db.py:253-297):
    row_number over a window, keep rank 1."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def where_used(files_df: DataFrame, class_name: str) -> DataFrame:
    """A11 — usage query: Java/JSP files whose content references
    ``class_name`` as a whole word, excluding the declaring file
    (reference core/usage.py:9-70; declaration = 'class <Name>')."""
    word = rf"\b{class_name}\b"
    decl = rf"\bclass\s+{class_name}\b"
    return (
        files_df.filter(F.col("lang").isin("java"))
        .filter(F.col("content").rlike(word))
        .filter(~F.col("content").rlike(decl))
        .select("repo", "path", "commit")
    )
