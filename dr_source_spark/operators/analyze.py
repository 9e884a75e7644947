"""The analyze stage: every detector tier fused into ONE Arrow-batched pass
over the corpus (`mapInPandas`), so each file's content crosses the
JVM→Python boundary exactly once and is parsed at most once per language.

Scale design (SURVEY.md §4 R6/R9/R10):

* The KB is compiled once on the driver and shipped as a Spark broadcast;
  regex/pattern compilation is memoized per executor process.
* Input is repartitioned by hash(repo, path) so one mega-repo never pins a
  single task (callers can also bucket by repo-size, see plans.skew).
* Output rows carry only narrow columns — the wide ``content`` column dies
  inside this stage (column pruning: we select exactly what we need first).
* Finding dedup on the reference identity key (path, line, type, message)
  happens inside the UDF per file — the key is file-local by construction
  (reference scanner.py:176-180 global set is equivalent because the key
  embeds the path), so NO shuffle is needed for dedup at all.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FINDINGS_FULL = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("vuln_type", StringType(), False),
        StructField("message", StringType(), False),
        StructField("severity", StringType(), False),
        StructField("line", IntegerType(), False),
        StructField("plugin", StringType(), False),
        StructField("trace", ArrayType(StringType()), True),
        StructField("rule_id", StringType(), True),
        StructField("cwe", StringType(), True),
        StructField("variable", StringType(), True),
        StructField("sink", StringType(), True),
        StructField("source", StringType(), True),
        StructField("base_type", StringType(), True),
    ]
)

_COLS = [f.name for f in FINDINGS_FULL.fields]


# Java framework mapper sinks fire during EVERY category pass
# (detectors/java_taint.py) — if any of these appear, no java category can
# be screened out.
_JAVA_FRAMEWORK_TOKENS = (
    "query", "update", "execute", "getWriter", "getOutputStream",
    "createQuery", "createNativeQuery", "createSelectionQuery", "createMutationQuery",
)


def _size_as_bytes(value: str) -> int:
    """Parse a Spark size conf string ('134217728', '128m', '1g', '512kb')."""
    v = value.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if v.endswith(suffix):
            v, mult = v[: -len(suffix)], m
            break
    return int(v) * mult


def _plan_size_bytes(df: DataFrame) -> Optional[int]:
    """Optimized-plan size statistic, or None when unknown. Driver-side
    metadata only — one JVM number crosses to Python (never the file-path
    list: enumerating every input path is O(num_files) driver memory at
    corpus scale), and no Spark job runs."""
    try:
        session = df.sparkSession
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        # relations without real statistics (e.g. LocalRelation) report the
        # defaultSizeInBytes sentinel — that's "unknown", not "huge"
        if size >= int(session._jsparkSession.sessionState().conf().defaultSizeInBytes()):
            return None
        return size
    except Exception:
        return None


def _conf_bytes(df: DataFrame, key: str, default: str) -> int:
    try:
        return _size_as_bytes(df.sparkSession.conf.get(key, default))
    except Exception:
        return _size_as_bytes(default)


def _estimated_splits(df: DataFrame) -> int:
    """Lower bound on the scan's natural split count: plan-size bytes over
    ``spark.sql.files.maxPartitionBytes`` (Spark's own packing never makes
    splits LARGER than maxPartitionBytes, so the true count is >= this).
    0 = unknown."""
    size = _plan_size_bytes(df)
    if size is None:
        return 0
    max_bytes = _conf_bytes(df, "spark.sql.files.maxPartitionBytes", "134217728b")
    return max(1, (size + max_bytes - 1) // max_bytes)


# analyzed-plan nodes that preserve their child's partitioning — the
# upstream-repartition walk below may look through these
_PARTITION_PRESERVING = {"Project", "Filter", "CollectMetrics", "SubqueryAlias"}


def _upstream_repartition_width(df: DataFrame) -> int:
    """numPartitions of a user repartition reachable from the plan root
    through partition-preserving nodes, else 0. Analysis-only (no
    optimizer run, no RDD conversion, no job): lets a producer that
    already widened its output (e.g. synth_code_corpus) skip a second
    content-carrying shuffle here."""
    try:
        node = df._jdf.queryExecution().analyzed()
        for _ in range(64):
            cls = node.getClass().getSimpleName()
            if cls in ("RepartitionByExpression", "Repartition"):
                return int(node.numPartitions())
            if cls not in _PARTITION_PRESERVING or node.children().size() != 1:
                return 0
            node = node.children().apply(0)
    except Exception:
        return 0
    return 0


def ensure_min_parallelism(
    df: DataFrame, key_cols=("repo", "path"), factor: int = 1, target: Optional[int] = None
) -> DataFrame:
    """Widen a CPU-bound stage's input to ≥ ``factor``× cores — never narrow it.

    ``target`` overrides the ``factor × cores`` width for stages whose
    per-byte cost is low enough that a full-cores fan-out loses more to
    python-worker round trips than it gains (see build_symbol_index's
    bytes-aware target). The never-narrow rule still applies.

    factor=1 (exactly cores) is the MEASURED optimum for the Arrow-batched
    detector stage: every extra task pays a python-worker round-trip +
    Arrow stream setup, and the round-3 A/B on the sf0.1 corpus (32 cores,
    best-of-3) was monotonic in partition count — 32 tasks 1.04s, 64 →
    1.35s, 96 → 1.61s, 128 → 1.78s, 192 → 2.25s. Straggler slack from
    over-partitioning only pays when single files run for seconds; callers
    with a known heavy-tailed corpus can pass factor>1 or pre-spread with
    skew.repartition_by_size_buckets.

    Three-band decision from plan-size statistics (no job, no path list):

    * big (bytes-based split lower bound >= target): leave alone — at
      100 TB width comes from real data volume; collapsing it would
      serialize the scan.
    * tiny (bytes < target x openCostInBytes): repartition to target
      unconditionally. Even a fragmented many-tiny-files input is better
      off as exactly `target` partitions here (< openCost bytes each), and
      skipping the plan->RDD conversion saves ~0.2-0.4 s of driver-side
      planning PER QUERY on literal-heavy plans (measured round 3).
    * middle band / unknown stats: pay one RDD plan conversion to read the
      ACTUAL planned split count, and only ever repartition UP — an input
      that already arrives wider than the target (e.g. 128 natural parquet
      splits) is never collapsed."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if target is None:
        target = factor * cores
    # a full-width repartition already in the plan makes a second shuffle
    # pure waste; only trusted at target >= cores so the bytes-aware
    # narrow targets (build_symbol_index at small corpora) keep their
    # measured optimum of coalescing BELOW an already-wide input
    if target >= cores and _upstream_repartition_width(df) >= target:
        return df
    if _estimated_splits(df) >= target:
        return df
    size = _plan_size_bytes(df)
    open_cost = _conf_bytes(df, "spark.sql.files.openCostInBytes", "4194304b")
    if size is not None and size < target * open_cost:
        return df.repartition(target, *key_cols)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *key_cols)
    return df


def _screen_specs(specs, content: str) -> list:
    """Category screening: a taint category can only produce hits if one of
    its sink identifiers occurs literally in the file text (sink matching
    compares method names lifted from the source in every tier). Pure
    substring checks — zero semantic risk, typically skips most of the
    ~10-20 category walks per file. Plain loops, not any(genexpr): this
    runs per (file x category) in the hot path and generator-frame setup
    was ~4% of single-thread detector time."""
    out = []
    for s in specs:
        for t in s.sink_tokens:
            if t in content:
                out.append(s)
                break
    return out


def _can_screen(lang: str, fn_index: Optional[Dict[str, Any]]) -> bool:
    """Screening looks at THIS file's text only; a tier that may simulate
    indexed callees (whose sinks live in other files) must not be screened."""
    if fn_index is None or not fn_index:
        return True
    if lang in ("java", "javascript"):
        return False
    if lang == "python":
        return not any(e.get("lang") == "python" for e in fn_index.values())
    return True  # php/ruby never consult the index


TIER_ERROR_PLUGIN = "__tier_error__"


# one broadcast per (application, CompiledKB object): repeated queries over
# the same KB must not re-ship it — each re-broadcast makes every python
# worker re-deserialize the whole rule catalog on its next task (measured
# ~0.5 s/query at 32 workers). Values hold (ckb, bc): the strong ckb ref
# keeps id() stable for the memo's lifetime.
_CKB_BC_MEMO: Dict[tuple, tuple] = {}


def broadcast_ckb(spark, ckb):
    key = (spark.sparkContext.applicationId, id(ckb))
    hit = _CKB_BC_MEMO.get(key)
    if hit is not None and hit[0] is ckb:
        return hit[1]
    bc = spark.sparkContext.broadcast(ckb)
    _CKB_BC_MEMO[key] = (ckb, bc)
    return bc


def _analyze_one(
    repo: str,
    path: str,
    commit: str,
    ext: str,
    content: str,
    ckb,
    fn_index: Optional[Dict[str, Any]],
    tiers: tuple,
    timeout_s: float = 0.0,
    emit_errors: bool = False,
) -> List[Dict[str, Any]]:
    """All findings for one file, reference plugin order: extension-specific
    plugins first (AST tier, then the pattern matcher), then the '.*'
    catch-all regex tier (scanner.py:163-164 builds extension_map[ext] +
    extension_map['.*']; tier order is unobservable through the dedup below
    because the tiers' vuln_type/message namespaces are disjoint, but it IS
    observable under a timeout). Dedup on (line, vuln_type, message)
    first-wins (scanner.py:176-180).

    Timeout/error semantics match the reference scanner loop: each tier is
    isolated (a failing plugin only loses its own findings,
    scanner.py:183-185), and when the deadline expires the findings already
    accumulated are KEPT — the alarm only skips the remaining plugins
    (scanner.py:165-188: earlier plugins' findings are already appended).
    Checks happen between tiers, not mid-tier, so granularity is one tier.

    emit_errors=True additionally appends one sentinel row (plugin =
    TIER_ERROR_PLUGIN) per swallowed tier failure or timeout, so parse
    failures are observable at corpus scale instead of silent finding loss;
    off by default for exact reference parity."""
    from ..detectors import pattern_match, python_taint, regex_scan

    findings: List[Dict[str, Any]] = []
    errors: List[Dict[str, Any]] = []
    import time

    deadline = time.monotonic() + timeout_s if timeout_s > 0 else None

    def expired() -> bool:
        return deadline is not None and time.monotonic() > deadline

    # one ast.parse per .py file, shared by the taint and pattern tiers
    # (each used to parse independently); cell stays empty if the ast tier
    # is disabled or the file is unparseable — the pattern tier then parses
    # (or fails quietly) itself, exactly as before
    py_tree_cell: List[Any] = []

    def _ast_tier() -> List[Dict[str, Any]]:
        if ext == ".py":
            import ast as _ast

            specs = ckb.taint.get("python", [])
            if _can_screen("python", fn_index):
                specs = _screen_specs(specs, content)
            try:
                tree = _ast.parse(content)
            except (SyntaxError, ValueError, RecursionError, MemoryError) as e:
                if emit_errors:
                    from ..detectors import ParseFailed

                    raise ParseFailed(f"python parse failed: {type(e).__name__}: {e}") from e
                return []
            py_tree_cell.append(tree)
            return python_taint.analyze_python(
                content, specs, fn_index=fn_index, raise_parse_errors=emit_errors, tree=tree
            )
        if ext == ".java":
            from ..detectors import java_taint

            specs = ckb.taint.get("java", [])
            if _can_screen("java", fn_index) and not any(t in content for t in _JAVA_FRAMEWORK_TOKENS):
                specs = _screen_specs(specs, content)
            return java_taint.analyze_java(content, specs, fn_index=fn_index)
        if ext in (".js", ".jsx", ".ts", ".tsx"):
            from ..detectors import js_taint

            specs = ckb.taint.get("javascript", [])
            if _can_screen("javascript", fn_index):
                specs = _screen_specs(specs, content)
            return js_taint.analyze_js(content, specs, fn_index=fn_index)
        if ext in (".php", ".phtml", ".php4", ".php5"):
            from ..detectors import php_taint

            return php_taint.analyze_php(content, _screen_specs(ckb.taint.get("php", []), content))
        if ext in (".rb", ".rake", ".gemspec"):
            from ..detectors import ruby_taint

            return ruby_taint.analyze_ruby(content, _screen_specs(ckb.taint.get("ruby", []), content))
        return []

    tier_fns = []
    if "ast" in tiers:
        tier_fns.append(("ast", _ast_tier))
    if "pattern" in tiers:
        tier_fns.append(
            ("pattern",
             lambda: pattern_match.analyze_pattern(
                 content, ext, ckb, tree=py_tree_cell[0] if py_tree_cell else None))
        )
    if "regex" in tiers:
        tier_fns.append(("regex", lambda: regex_scan.analyze_regex(content, ext, ckb)))

    for tier_name, fn in tier_fns:
        if expired():
            errors.append({"tier": tier_name, "err": "timeout: remaining tiers skipped"})
            break
        try:
            findings += fn()
        except Exception as e:  # per-plugin isolation (scanner.py:183-185)
            errors.append({"tier": tier_name, "err": f"{type(e).__name__}: {e}"})

    seen = set()
    out = []
    for f in findings:
        key = (f["line"], f["vuln_type"], f["message"])
        if key in seen:
            continue
        seen.add(key)
        f = dict(f)
        f["repo"], f["path"], f["commit"] = repo, path, commit
        f["cwe"] = ckb.cwe_by_type.get(f.pop("base_type", None) or "", None)
        f["base_type"] = f["vuln_type"].split(" (")[0]
        out.append(f)

    if emit_errors:
        for e in errors:
            out.append(
                {
                    "repo": repo, "path": path, "commit": commit,
                    "vuln_type": "__TIER_ERROR__",
                    "message": f"{e['tier']}: {e['err']}"[:500],
                    "severity": "INFO", "line": 0,
                    "plugin": TIER_ERROR_PLUGIN, "trace": [],
                    "rule_id": None, "cwe": None, "variable": None,
                    "sink": None, "source": None, "base_type": "__TIER_ERROR__",
                }
            )
    return out


def run_detectors(
    files_df: DataFrame,
    ckb,
    fn_index_broadcast=None,
    tiers: tuple = ("regex", "ast", "pattern"),
    per_file_timeout_s: float = 0.0,
    repartition: Optional[int] = None,
    use_arrow: bool = True,
    fn_index_from_column: bool = False,
    emit_tier_errors: bool = False,
    straggler_factor: int = 1,
    regex_jvm: bool = False,
) -> DataFrame:
    """files_df must carry (repo, path, commit, ext, content).

    use_arrow: mapInArrow path (default) — skips the pandas object-array
    round-trip on both sides of the UDF (the detectors consume plain Python
    strings either way); mapInPandas kept as the fallback.

    fn_index_from_column: read each row's ``called_defs`` map (attached by
    operators/index_join.attach_called_defs) instead of a global broadcast —
    the inter-file path that needs no driver collect at any corpus scale.

    emit_tier_errors: append one sentinel row (plugin = TIER_ERROR_PLUGIN)
    per swallowed tier failure/timeout so parse failures become an
    observable metric at corpus scale (pipeline.extract splits them off).

    straggler_factor: partition-width multiplier for heavy-tailed corpora
    (skew.straggler_factor_from measures and decides — factor=1 stays the
    uniform-corpus optimum, see ensure_min_parallelism).

    regex_jvm: run the regex tier as a JVM-only relational plan
    (operators/regex_relational.py) unioned with the Python AST/pattern
    tiers — finding-identical to the fused path (the tiers' dedup key
    namespaces are disjoint, see _analyze_one; gated by
    tests/test_regex_relational.py::test_split_mode_equals_fused).
    MEASURED AND KEPT OFF BY DEFAULT: on the sf0.1 corpus at local[32]
    the split plan is ~2.6× slower than the fused path (0.9 s vs 2.4 s,
    best-of-3) — it scans the input twice and evaluates every rule as an
    RLIKE branch per line, while the fused tier's combined-alternation
    screen skips most lines in one probe. It exists for regex-heavy
    deployments where Python workers are the proven bottleneck (b1-style
    regex-only scans already have regex_findings_relational). Incompatible
    with per_file_timeout_s (the reference's timeout spans tiers within
    one file, which a split plan cannot honor)."""
    from ..deploy import ensure_shipped

    spark = files_df.sparkSession
    ensure_shipped(spark)
    if regex_jvm and "regex" in tiers:
        if per_file_timeout_s:
            raise ValueError("regex_jvm is incompatible with per_file_timeout_s")
        from .regex_relational import regex_findings_full_relational

        py_part = run_detectors(
            files_df, ckb,
            fn_index_broadcast=fn_index_broadcast,
            tiers=tuple(t for t in tiers if t != "regex"),
            repartition=repartition, use_arrow=use_arrow,
            fn_index_from_column=fn_index_from_column,
            emit_tier_errors=emit_tier_errors,
            straggler_factor=straggler_factor,
        )
        rel_part = regex_findings_full_relational(
            files_df.select("repo", "path", "commit", "ext", "content"), ckb
        )
        return py_part.unionByName(rel_part)
    ckb_bc = broadcast_ckb(spark, ckb)

    cols = ["repo", "path", "commit", "ext", "content"]
    if fn_index_from_column:
        cols.append("called_defs")
    narrow = files_df.select(*cols)
    if repartition:
        narrow = narrow.repartition(repartition, "repo", "path")
    else:
        # A small/compacted corpus can arrive as fewer splits than cores —
        # the CPU-bound detector stage must never be narrower than the
        # cluster (and wants straggler slack, see ensure_min_parallelism).
        narrow = ensure_min_parallelism(narrow, factor=max(1, straggler_factor))

    def _norm_map(cell) -> Optional[Dict[str, Any]]:
        if cell is None:
            return None
        if isinstance(cell, dict):
            return {k: dict(v) if not isinstance(v, dict) else v for k, v in cell.items()}
        # arrow MapArray.to_pylist yields [(key, value), ...]
        return {k: dict(v) if not isinstance(v, dict) else v for k, v in cell}

    def _rows_for_batch(cols, ckb_local, fn_index) -> List[Dict[str, Any]]:
        rows: List[Dict[str, Any]] = []
        if fn_index_from_column:
            for repo, path, commit, ext, content, defs in zip(*cols):
                if content is None:
                    continue
                rows.extend(
                    _analyze_one(
                        repo, path, commit, ext or "", content, ckb_local,
                        _norm_map(defs), tiers, per_file_timeout_s, emit_tier_errors,
                    )
                )
            return rows
        for repo, path, commit, ext, content in zip(*cols):
            if content is None:
                continue
            rows.extend(
                _analyze_one(
                    repo, path, commit, ext or "", content, ckb_local, fn_index,
                    tiers, per_file_timeout_s, emit_tier_errors,
                )
            )
        return rows

    if use_arrow:
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                pa.field("repo", pa.string()), pa.field("path", pa.string()),
                pa.field("commit", pa.string()), pa.field("vuln_type", pa.string()),
                pa.field("message", pa.string()), pa.field("severity", pa.string()),
                pa.field("line", pa.int32()), pa.field("plugin", pa.string()),
                pa.field("trace", pa.list_(pa.string())), pa.field("rule_id", pa.string()),
                pa.field("cwe", pa.string()), pa.field("variable", pa.string()),
                pa.field("sink", pa.string()), pa.field("source", pa.string()),
                pa.field("base_type", pa.string()),
            ]
        )

        n_in_cols = 6 if fn_index_from_column else 5

        def process_arrow(batches):
            ckb_local = ckb_bc.value
            fn_index = fn_index_broadcast.value if fn_index_broadcast is not None else None
            for batch in batches:
                cols = [batch.column(i).to_pylist() for i in range(n_in_cols)]
                rows = _rows_for_batch(cols, ckb_local, fn_index)
                arrays = [pa.array([r[f.name] for r in rows], type=f.type) for f in arrow_schema]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        return narrow.mapInArrow(process_arrow, FINDINGS_FULL)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ckb_local = ckb_bc.value
        fn_index = fn_index_broadcast.value if fn_index_broadcast is not None else None
        for pdf in batches:
            in_cols = [pdf["repo"], pdf["path"], pdf["commit"], pdf["ext"], pdf["content"]]
            if fn_index_from_column:
                in_cols.append(pdf["called_defs"])
            rows = _rows_for_batch(tuple(in_cols), ckb_local, fn_index)
            yield (
                pd.DataFrame(rows, columns=_COLS)
                if rows
                else pd.DataFrame({c: pd.Series([], dtype="object") for c in _COLS})
            )

    return narrow.mapInPandas(process, FINDINGS_FULL)
