"""Proof that the flagship SQL oracle's per-template constants are exact.

The kg_extract_triples oracle (sources/synth.py:kg_triples_oracle_sql)
asserts the full extract() pipeline emits EXPECTED_TRIPLES for every
synthesized file, with only {N}/{W} substituted. That holds only if no
corpus word W can change the detector output (e.g. a W that matches an
extra regex rule, or breaks a parser). This test runs the REAL detector
stack (no Spark) over every distinct W value present in the driver corpora
— all SFs share one 30-word vocabulary — for several doc ids, and asserts
the finding-derived triples equal the constants exactly.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from dr_source_spark.kb import compile_kb, load_kb
from dr_source_spark.operators.analyze import _analyze_one
from dr_source_spark.sources.synth import EXPECTED_FINDINGS, EXPECTED_TRIPLES, render_template

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def corpus_words() -> list[str]:
    con = duckdb.connect()
    words: set[str] = set()
    for d in SF_DIRS:
        rows = con.execute(
            "SELECT DISTINCT regexp_replace(coalesce(string_split(text, ' ')[3], 'field'),"
            " '[^A-Za-z0-9_]', 'x', 'g') FROM "
            f"'{d}/documents.parquet'"
        ).fetchall()
        words.update(r[0] for r in rows)
    return sorted(words)


def triples_of(findings, file_uri: str) -> Counter:
    out: Counter = Counter()
    for f in findings:
        line = f["line"]
        trace = " -> ".join(f.get("trace") or [])
        if f.get("cwe"):
            out[(file_uri, "HAS_VULN", f["cwe"], line, trace)] += 1
        if f.get("rule_id"):
            out[(f"{file_uri}#L{line}", "MATCHES_RULE", f["rule_id"], line, trace)] += 1
        if f.get("variable") and f.get("source"):
            out[(f"{file_uri}#var:{f['variable']}", "TAINTED_BY", f["source"], line, trace)] += 1
        if f.get("variable") and f.get("sink"):
            out[(f"{file_uri}#var:{f['variable']}", "FLOWS_TO", f"{f['sink']}@L{line}", line, trace)] += 1
    return out


def expected_counter(tpl: int, doc_id: int, word: str, path: str) -> Counter:
    n, m = str(doc_id), str(doc_id - 1)
    file_uri = f"r:{path}@bench"
    out: Counter = Counter()
    for frag_t, pred, obj_t, line, trace_t in EXPECTED_TRIPLES[tpl][1]:
        sub = lambda s: s.replace("{N}", n).replace("{W}", word).replace("{M}", m)  # noqa: E731
        out[(file_uri + sub(frag_t), pred, sub(obj_t), line, sub(trace_t))] += 1
    return out


def _interfile_index(doc_id: int, word: str):
    """The exact broadcast entry the pipeline's index job would produce for
    the caller template's companion helper file (template 6, doc_id-1)."""
    from dr_source_spark.parsers.javaparse import extract_method_defs

    callee_path, callee_content = render_template(6, doc_id - 1, word)
    return {
        d["name"]: {
            "path": callee_path, "repo": "r", "lang": "java",
            "def_source": d["def_source"], "def_line": d["def_line"],
            "params": d["params"],
        }
        for d in extract_method_defs(callee_content)
    }


# doc ids are ≡ 7 (mod #templates) so the inter-file caller template renders
# with a valid companion id (M = doc_id-1 ≥ 6); other templates accept any id
@pytest.mark.parametrize("doc_id", [7, 17, 1237])
def test_every_corpus_word_yields_the_oracle_constants(doc_id):
    ckb = compile_kb(load_kb())
    words = corpus_words()
    assert words, "corpus vocabulary must be non-empty"
    for tpl in EXPECTED_TRIPLES:
        for w in words:
            path, content = render_template(tpl, doc_id, w)
            ext = "." + path.rsplit(".", 1)[1]
            fn_index = _interfile_index(doc_id, w) if tpl == 7 else None
            findings = _analyze_one(
                "r", path, "bench", ext, content, ckb, fn_index, ("regex", "ast", "pattern")
            )
            got = triples_of(findings, f"r:{path}@bench")
            want = expected_counter(tpl, doc_id, w, path)
            assert got == want, f"tpl={tpl} w={w!r}: {got ^ want}"
            # finding-level constants (message/severity/variable/sink) — the
            # canonicalization oracle's basis
            sub = lambda s: s and s.replace("{N}", str(doc_id)).replace("{W}", w).replace("{M}", str(doc_id - 1))  # noqa: E731
            got_f = Counter(
                (f["base_type"], f["line"], f["message"], f["variable"], f["sink"],
                 f["severity"], " -> ".join(f.get("trace") or []))
                for f in findings
            )
            want_f = Counter(
                (bt, line, sub(msg), sub(var), sink, sev, sub(trace))
                for bt, line, msg, var, sink, sev, trace in EXPECTED_FINDINGS[tpl]
            )
            assert got_f == want_f, f"tpl={tpl} w={w!r}: {got_f ^ want_f}"
