"""Parse-fidelity gates over REAL OSS code (tests/realcode/, hash-pinned —
see its README.md for provenance). The reference parses arbitrary code via
tree-sitter (plugins/java/plugin.py:79-83 and peers); this suite is the
equivalent evidence for the hand-rolled parsers:

1. no crashes, no swallowed tier errors, bounded wall time per file;
2. deterministic findings across runs;
3. 100% planted-flow recovery — a known source→sink snippet appended to
   every real file must still be detected (real-world syntax earlier in
   the file must not desync the parser into silent finding loss);
4. the symbol-index extractors see real structure (defs > 0);
5. the whole corpus survives the Spark pipeline end-to-end with zero
   tier errors.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pytest

from dr_source_spark.kb import compile_kb, load_kb

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "realcode")
CKB = compile_kb(load_kb(project_dir="/nonexistent"))

with open(os.path.join(ROOT, "MANIFEST.json")) as _f:
    MANIFEST = json.load(_f)


def _read(rel: str) -> str:
    with open(os.path.join(ROOT, rel), encoding="utf-8", errors="ignore") as f:
        return f.read()


def _all_files():
    return sorted(MANIFEST)


# planted source→sink flows per language: (snippet, expected sink substring)
_PLANT = {
    ".java": (
        "\nclass DrPlantedProbe {\n"
        "    public void handle(javax.servlet.http.HttpServletRequest request,"
        " java.sql.Statement statement) throws Exception {\n"
        '        String user = request.getParameter("q");\n'
        "        statement.executeQuery(user);\n    }\n}\n",
        "executeQuery",
    ),
    ".js": (
        "\napp.get('/dr_probe', (req, res) => {\n    const p = req.query.cmd;\n    eval(p);\n});\n",
        "eval",
    ),
    ".php": (
        "\n<?php\n$id = $_GET['x'];\n$q = \"SELECT * FROM t WHERE id = \" . $id;\n"
        "mysqli_query($conn, $q);\n?>\n",
        "mysqli_query",
    ),
    ".rb": ('\nv = params[:cmd]\nsystem("lookup #{v}")\n', "system"),
}


def _analyze_all_tiers(rel: str, content: str):
    from dr_source_spark.operators.analyze import _analyze_one

    ext = os.path.splitext(rel)[1]
    return _analyze_one(
        "realcode", rel, "pin", ext, content, CKB, None,
        ("ast", "pattern", "regex"), 0.0, True,
    )


def test_manifest_hashes_pin_the_corpus():
    assert len(MANIFEST) >= 30
    for rel, want in MANIFEST.items():
        with open(os.path.join(ROOT, rel), "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == want, f"{rel} drifted from MANIFEST.json"


@pytest.mark.parametrize("rel", _all_files())
def test_no_crash_no_tier_errors_and_deterministic(rel):
    content = _read(rel)
    t0 = time.monotonic()
    first = _analyze_all_tiers(rel, content)
    assert time.monotonic() - t0 < 10.0, f"{rel}: pathological parse time"
    errors = [f for f in first if f["plugin"] == "__tier_error__"]
    assert errors == [], f"{rel}: swallowed tier errors {errors}"
    second = _analyze_all_tiers(rel, content)
    key = lambda f: (f["line"], f["vuln_type"], f["message"], tuple(f["trace"] or []))
    assert sorted(map(key, first)) == sorted(map(key, second)), f"{rel}: nondeterministic"


@pytest.mark.parametrize("rel", [r for r in _all_files() if os.path.splitext(r)[1] in _PLANT])
def test_planted_flow_recovered_after_real_code(rel):
    """The hard recall gate: 100%, no floor. Each miss here was a real
    whole-file finding-loss bug when this corpus landed (round 3)."""
    ext = os.path.splitext(rel)[1]
    plant, sink = _PLANT[ext]
    out = _analyze_all_tiers(rel, _read(rel) + plant)
    assert any(sink in (f.get("sink") or "") for f in out), (
        f"{rel}: planted {sink} flow lost — real-world syntax desynced the parser"
    )


def _insert_after_imports(src: str, plant: str) -> str:
    lines = src.split("\n")
    last = -1
    for i, ln in enumerate(lines):
        if ln.strip().startswith(("import ", "package ")):
            last = i
    return "\n".join(lines[: last + 1] + [plant] + lines[last + 1 :])


@pytest.mark.parametrize("rel", [r for r in _all_files() if os.path.splitext(r)[1] in _PLANT])
def test_planted_flow_recovered_before_real_code(rel):
    """Mirror gate with the plant at the TOP (after any imports): catches
    parser/engine state corruption that persists past an early finding —
    the end-append probe alone can't see desyncs occurring AFTER the
    plant's position."""
    ext = os.path.splitext(rel)[1]
    plant, sink = _PLANT[ext]
    src = _read(rel)
    probed = _insert_after_imports(src, plant) if ext == ".java" else plant + "\n" + src
    out = _analyze_all_tiers(rel, probed)
    assert any(sink in (f.get("sink") or "") for f in out), (
        f"{rel}: top-planted {sink} flow lost"
    )


def test_symbol_extractors_see_real_structure():
    from dr_source_spark.parsers.javaparse import extract_method_defs
    from dr_source_spark.parsers.jsparse import extract_function_defs

    jdefs = extract_method_defs(_read("java/JavaPageRank.java"))
    assert {d["name"] for d in jdefs} >= {"main", "showWarning"}
    jsdefs = extract_function_defs(_read("js/gae_console.js"))
    assert len(jsdefs) > 0


def test_realcode_corpus_through_spark_pipeline(spark):
    from dr_source_spark.pipeline import extract
    from dr_source_spark.sources.corpus import corpus_from_dir

    corpus = corpus_from_dir(spark, ROOT, repo="realcode", commit="pin")
    res = extract(spark, corpus, run_id="realcode")
    findings = res.findings.collect()
    assert res.tier_errors.count() == 0
    # determinism end-to-end (Arrow batching, broadcast KB, partitioning)
    res2 = extract(spark, corpus, run_id="realcode")
    key = lambda r: (r.path, r.line, r.vuln_type, r.message)
    assert sorted(map(key, findings)) == sorted(map(key, res2.findings.collect()))
    res.cleanup()
    res2.cleanup()
