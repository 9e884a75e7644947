"""Column-level scalar builders (SURVEY.md §2D scalar-function checklist):
sha256 ingest invariant, file URIs, trace flatten/split (reference
scanner.py:209 / db.py:246-248), severity normalization
(regex/plugin.py:73-75). All JVM expressions — codegen-friendly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEVERITY_WHITELIST = ("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO")


def content_sha256(col: str = "content") -> Column:
    """The per-row ingest invariant: sha256 over UTF-8 bytes."""
    return F.sha2(F.col(col), 256)


def file_uri(repo: str = "repo", path: str = "path", commit: str = "commit") -> Column:
    return F.concat_ws("", F.col(repo), F.lit(":"), F.col(path), F.lit("@"), F.col(commit))


def flatten_trace(col: str = "trace") -> Column:
    """array<string> → the reference's storage form (' -> ' joined)."""
    return F.array_join(F.col(col), " -> ")


def split_trace(col: str) -> Column:
    """storage form → array<string> (empty string → empty array, matching
    the reference's read path db.py:246-248)."""
    return F.when(F.col(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.col(col), " -> ")
    )


def normalize_severity(col: str = "severity") -> Column:
    """Uppercase + whitelist, unknown → INFO (regex/plugin.py:73-75)."""
    up = F.upper(F.col(col))
    return F.when(up.isin(*SEVERITY_WHITELIST), up).otherwise(F.lit("INFO"))
