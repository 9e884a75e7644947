"""B1 as a pure-relational plan: no Python in the hot path.

``posexplode(split(content, '\\n'))`` → broadcast-join the exploded rule
dimension (general rules + language rules on the file's regex-tier lang) →
``RLIKE`` with the pattern column → findings. Whole-stage codegen end to
end; the regex evaluation runs in the JVM.

Dialect note: the KB's shipped patterns are Java-regex compatible (verified
by the equivalence test against the Python-`re` UDF tier on the fixture
corpus). User KB overlays with Python-only constructs should use the UDF
tier (`operators/analyze.py`), which is the default pipeline path; this
plan is the scale-optimized alternative for regex-only scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kb.compile import REGEX_LANG_MAP
from ..kb.loader import KnowledgeBase
from ..kb.compile import kb_rules_df


def regex_findings_relational(spark: SparkSession, files_df: DataFrame, kb: KnowledgeBase) -> DataFrame:
    """files_df needs (repo, path, commit, ext, content) → findings rows
    identical to the UDF regex tier."""
    rules = kb_rules_df(spark, kb).filter(F.col("tier") == "regex").select(
        "vuln_type", "cwe", "lang", "rule_id", "pattern", "message", "rule_severity"
    )

    lang_map = F.create_map(*[F.lit(x) for kv in REGEX_LANG_MAP.items() for x in kv])
    lines = files_df.select(
        "repo",
        "path",
        "commit",
        F.element_at(lang_map, F.col("ext")).alias("regex_lang"),
        F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line_text"),
    ).withColumn("line", (F.col("pos") + 1).cast("int")).drop("pos")

    joined = lines.join(
        F.broadcast(rules),
        (F.col("lang") == "*") | (F.col("lang") == F.col("regex_lang")),
    ).filter(F.expr("line_text RLIKE pattern"))

    return joined.select(
        "repo",
        "path",
        "commit",
        F.col("vuln_type"),
        F.concat(F.lit("("), F.col("rule_id"), F.lit(") "), F.col("message")).alias("message"),
        F.col("rule_severity").alias("severity"),
        F.col("line"),
        F.lit("General Regex Analyzer").alias("plugin"),
        F.array().cast("array<string>").alias("trace"),
        F.col("rule_id"),
        F.col("cwe"),
    )
