"""Privacy-audit operators: k-anonymity and l-diversity reports.

A corpus that trains a model is also a corpus that leaks: before
releasing or training on user-derived tables, a pipeline audits
re-identification risk. The two standard screens are k-anonymity
(every quasi-identifier combination is shared by at least k rows) and
l-diversity (within each quasi-identifier group the sensitive
attribute takes at least l distinct values — a k-anonymous group whose
members all share one sensitive value still leaks it).

Both are pure hash aggregates over the quasi-identifier key — one
map-side-combined shuffle each, no joins, no UDFs — so they run at any
scale the groupBy runs. The reports return EVERY group with its size /
diversity and an ``exposed`` verdict rather than only the failing
groups: the audit artifact a reviewer signs off is the full census,
and the failing subset is a filter away.

These complement the content-side PII heuristics (the detector tiers'
PII rules and training/text.py's scrubber): those find identifier
VALUES in text; these measure identifier STRUCTURE in tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str | Column], k: int
) -> DataFrame:
    """Group size per quasi-identifier combination with the k-anonymity
    verdict: ``exposed`` is true iff fewer than ``k`` rows share the
    combination (those rows are re-identifiable to within < k
    candidates)."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("group_n"),
        (F.count("*") < k).alias("exposed"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str | Column,
    l: int,  # noqa: E741 - the metric's canonical name
) -> DataFrame:
    """Distinct sensitive values per quasi-identifier group with the
    l-diversity verdict: ``exposed`` is true iff the group's sensitive
    attribute takes fewer than ``l`` distinct values (count-distinct
    expands to the standard two-phase aggregate; the shuffle key is
    still the narrow quasi tuple)."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("group_n"),
        F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
        (F.countDistinct(sensitive_col) < l).alias("exposed"),
    )
