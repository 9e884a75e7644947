"""B1 as a pure-relational plan: no Python in the hot path.

``posexplode(split(content, '\\n'))`` → one projection that evaluates every
KB rule as a *literal* ``RLIKE`` branch (the rule set is known at plan time —
it is the driver-side KB object, no collect needed) and emits the matching
rules as an array of structs → ``explode``. Whole-stage codegen end to end;
every regex is compiled exactly ONCE by the JVM because the pattern is
foldable. (The previous shape — broadcast-joining a rule dimension and
evaluating ``RLIKE`` with a pattern COLUMN — recompiled
``java.util.regex.Pattern`` per row×rule: Spark only caches the compiled
pattern when it is foldable.)

Dialect note: the KB's shipped patterns are Java-regex compatible (verified
by the equivalence test against the Python-`re` UDF tier on the fixture
corpus). User KB overlays with Python-only constructs should use the UDF
tier (`operators/analyze.py`), which is the default pipeline path; this
plan is the scale-optimized alternative for regex-only scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kb.compile import LANGS, REGEX_LANG_MAP, _norm_severity
from ..kb.loader import KnowledgeBase


def _driver_side_rules(kb: KnowledgeBase):
    """(vuln_type, cwe, lang, rule_id, pattern, message, severity) per regex
    rule, in KB order — same rows kb_rules_df emits for tier='regex'."""
    rules = []
    for vt in kb.vuln_types():
        cwe = kb.cwe(vt)
        for r in kb.general_regex(vt):
            rules.append((vt, cwe, "*", r.get("id"), r.get("pattern"), r.get("message"),
                          _norm_severity(r.get("severity", "MEDIUM"))))
        for lang in LANGS:
            for r in kb.lang_regex(vt, lang):
                rules.append((vt, cwe, lang, r.get("id"), r.get("pattern"), r.get("message"),
                              _norm_severity(r.get("severity", "MEDIUM"))))
    return rules


def regex_findings_relational(spark: SparkSession, files_df: DataFrame, kb: KnowledgeBase) -> DataFrame:
    """files_df needs (repo, path, commit, ext, content) → findings rows
    identical to the UDF regex tier."""
    lang_map = F.create_map(*[F.lit(x) for kv in REGEX_LANG_MAP.items() for x in kv])
    lines = files_df.select(
        "repo",
        "path",
        "commit",
        F.element_at(lang_map, F.col("ext")).alias("regex_lang"),
        F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line_text"),
    ).withColumn("line", (F.col("pos") + 1).cast("int")).drop("pos")

    branches = []
    for vt, cwe, lang, rule_id, pattern, message, severity in _driver_side_rules(kb):
        hit = F.col("line_text").rlike(pattern)  # literal pattern → foldable,
        # the JVM compiles it once per plan, not once per row
        if lang != "*":
            hit = (F.col("regex_lang") == F.lit(lang)) & hit
        branches.append(
            F.when(
                hit,
                F.struct(
                    F.lit(vt).alias("vuln_type"),
                    F.lit(f"({rule_id}) {message}").alias("message"),
                    F.lit(severity).alias("severity"),
                    F.lit(rule_id).alias("rule_id"),
                    F.lit(cwe).cast("string").alias("cwe"),
                ),
            )
        )
    matched = F.filter(F.array(*branches), lambda m: m.isNotNull())

    return lines.select(
        "repo", "path", "commit", "line", F.explode(matched).alias("m")
    ).select(
        "repo",
        "path",
        "commit",
        F.col("m.vuln_type").alias("vuln_type"),
        F.col("m.message").alias("message"),
        F.col("m.severity").alias("severity"),
        F.col("line"),
        F.lit("General Regex Analyzer").alias("plugin"),
        F.array().cast("array<string>").alias("trace"),
        F.col("m.rule_id").alias("rule_id"),
        F.col("m.cwe").alias("cwe"),
    )


def regex_findings_full_relational(files_df: DataFrame, ckb) -> DataFrame:
    """The regex tier as a JVM-only plan emitting the FULL findings schema
    (operators/analyze.FINDINGS_FULL) — drop-in replacement for the UDF
    regex tier in run_detectors' split mode (regex_jvm=True). Rules come
    from the CompiledKB (same normalized severities the UDF tier uses);
    the post-processing the fused path applies per finding (cwe from
    base_type, base_type = vuln_type before ' (') is reproduced as
    literals since every rule's vuln_type is known at plan time."""
    lang_map = F.create_map(*[F.lit(x) for kv in REGEX_LANG_MAP.items() for x in kv])
    lines = files_df.select(
        "repo",
        "path",
        "commit",
        F.element_at(lang_map, F.col("ext")).alias("regex_lang"),
        F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line_text"),
    ).withColumn("line", (F.col("pos") + 1).cast("int")).drop("pos")

    branches = []
    rules = [("*", r) for r in ckb.general_regex]
    for lang, lst in ckb.lang_regex.items():
        rules.extend((lang, r) for r in lst)
    for lang, r in rules:
        hit = F.col("line_text").rlike(r.pattern)
        if lang != "*":
            hit = (F.col("regex_lang") == F.lit(lang)) & hit
        base_type = r.vuln_type.split(" (")[0]
        branches.append(
            F.when(
                hit,
                F.struct(
                    F.lit(r.vuln_type).alias("vuln_type"),
                    F.lit(f"({r.rule_id}) {r.message}").alias("message"),
                    F.lit(r.severity).alias("severity"),
                    F.lit(r.rule_id).alias("rule_id"),
                    F.lit(ckb.cwe_by_type.get(r.vuln_type)).cast("string").alias("cwe"),
                    F.lit(base_type).alias("base_type"),
                ),
            )
        )
    matched = F.filter(F.array(*branches), lambda m: m.isNotNull())
    exploded = lines.select(
        "repo", "path", "commit", "line", F.explode(matched).alias("m")
    )
    return exploded.select(
        "repo",
        "path",
        "commit",
        F.col("m.vuln_type").alias("vuln_type"),
        F.col("m.message").alias("message"),
        F.col("m.severity").alias("severity"),
        F.col("line").cast("int").alias("line"),
        F.lit("General Regex Analyzer").alias("plugin"),
        F.array().cast("array<string>").alias("trace"),
        F.col("m.rule_id").alias("rule_id"),
        F.col("m.cwe").alias("cwe"),
        F.lit(None).cast("string").alias("variable"),
        F.lit(None).cast("string").alias("sink"),
        F.lit(None).cast("string").alias("source"),
        F.col("m.base_type").alias("base_type"),
    )
