"""Matcher-level live differential fuzz for the textual pattern fallback.

The reference's tree-sitter STRUCTURAL matcher cannot run here (no
tree-sitter wheels), but its TEXTUAL fallback —
``TreeSitterPatternMatcher._textual_match``
(reference plugins/pattern/ts_matcher.py:73-102) — is pure Python: it
only touches ``self.METAVARIABLE_PATTERN`` (a class attribute) and the
``re`` module. So the fallback CAN be diffed live, per VERDICT r4 next-#6:
call the matcher, not the plugin.

This tool synthesizes (pattern, text) pairs across all five pattern-tier
languages (python, java, javascript, php, ruby):

* patterns: every textual pattern reachable in the compiled KB, plus a
  generated family of ``$X == $X``-shaped exemplars — repeated metavars
  (unification), distinct metavars, 3+ metavars (the reference's
  first-two-only unification quirk), ellipsis, metavar+ellipsis mixes,
  and no-metavar literals — styled per language (PHP ``$vars``, Ruby
  ``@ivar``-free identifiers, Java ``.equals`` calls, ...).
* texts: satisfying instantiations (consistent metavar fill), unification
  violations (divergent fill), near-misses (embedded in prefix/suffix —
  the fallback anchors ``^...$`` on stripped text), whitespace variants,
  regex-metacharacter noise, empty and multi-line texts.

The reference fallback runs ONE subprocess for the whole batch (module
loaded by file path so the stubbed tree-sitter imports resolve without
executing any plugin); our ``textual_match``
(dr_source_spark/detectors/pattern_match.py) runs in-process. Verdicts
must be identical for every pair.

Usage: python tools/matcher_diff_fuzz.py [N_PAIRS] [seed]
Exit code 0 and a JSON line with ``divergences: 0`` on success.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr_source_spark.detectors.pattern_match import textual_match
from dr_source_spark.kb import compile_kb, load_kb
from tools.reference_anchor import ensure_stubs

REFERENCE_TS_MATCHER = "/root/reference/dr_source/plugins/pattern/ts_matcher.py"

# identifier pools styled per language — the fallback's capture group is
# (\$?[a-zA-Z_][a-zA-Z0-9_]*), so PHP's $-sigil identifiers are the one
# shape that exercises the optional \$? branch
_IDENTS = {
    "python": ["x", "user_input", "data", "q2", "_tmp", "CONST"],
    "java": ["x", "userInput", "req", "val2", "_t", "s"],
    "javascript": ["x", "userInput", "req", "val2", "_t", "cb"],
    "php": ["$x", "$user_input", "$data", "$q2", "$_t", "x"],
    "ruby": ["x", "user_input", "data", "q2", "_t", "val"],
}

# pattern family per language: $X == $X-shaped and beyond. Metavariables
# must match \$([A-Z_][A-Z0-9_]*).
_PATTERN_FAMILY = {
    "python": [
        "$X == $X",
        "$X == $Y",
        "$X != $X",
        "$F($X, $X)",
        "$F($X, $Y, $X)",
        "eval($X)",
        "os.system(...)",
        "$OBJ.execute($Q, ...)",
        "1 == 1",
        "$X is $X",
    ],
    "java": [
        "$X == $X",
        "$X.equals($X)",
        "$X.equals($Y)",
        "$STMT.executeQuery($Q)",
        "Runtime.getRuntime().exec($CMD)",
        "$A.compareTo($A, $B)",
        "$X == $X && $Y == $Y",
        "response.getWriter().println(...)",
        "0 == 0",
    ],
    "javascript": [
        "$X == $X",
        "$X === $X",
        "$X === $Y",
        "eval($CODE)",
        "$EL.innerHTML = $V",
        "$F($A, $A, $A)",
        "document.write(...)",
        "$X == $X || $Y",
        "true == true",
    ],
    "php": [
        "$X == $X",
        "$X === $X",
        "mysqli_query($CONN, $Q)",
        "eval($CODE)",
        "strcmp($A, $A)",
        "$F($A, $B, $A)",
        "system(...)",
        "1 == 1",
    ],
    "ruby": [
        "$X == $X",
        "$X == $Y",
        "$X.eql?($X)",
        "system($CMD)",
        "$OBJ.send($M, ...)",
        "$F($A, $A, $B)",
        "puts $X",
        "2 == 2",
    ],
}

_SNIPPETS = ['"a"', "1, 2", "foo(bar)", "x + y", '"); drop', "a.b.c", ""]
_NOISE_TEXTS = [
    "",
    "   ",
    "a == b == c",
    "f(x) == f(x)",
    "(x) == (x)",
    "x==x",
    "x  ==  x",
    "$x == $x",
    "$X == $X",
    "a == a # trailing comment",
    "line1\nline2 == line2",
    "x.*? == x.*?",
    "[a] == [a]",
    "a\\ == a\\",
    "強い == 強い",
    "x == x;",
]


def _fill_pattern(pattern: str, lang: str, rng: random.Random, consistent: bool) -> str:
    """Instantiate a pattern's metavariables with language-styled
    identifiers (same identifier per metavar when ``consistent``) and its
    ellipses with random snippets."""
    import re as _re

    idents = _IDENTS[lang]
    mapping: dict[str, str] = {}

    def sub_mv(m):
        name = m.group(1)
        if consistent:
            if name not in mapping:
                mapping[name] = rng.choice(idents)
            return mapping[name]
        return rng.choice(idents)

    text = _re.sub(r"\$([A-Z_][A-Z0-9_]*)", sub_mv, pattern)
    while "..." in text:
        text = text.replace("...", rng.choice(_SNIPPETS), 1)
    return text


def generate_pairs(n_pairs: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    ckb = compile_kb(load_kb(project_dir="/nonexistent"))

    # every textual pattern string reachable in the compiled KB logic
    def walk(logic, out):
        if isinstance(logic, str):
            out.append(logic)
        elif isinstance(logic, dict):
            for v in logic.values():
                walk(v, out)
        elif isinstance(logic, list):
            for v in logic:
                walk(v, out)

    lang_patterns = {lang: list(fam) for lang, fam in _PATTERN_FAMILY.items()}
    for lang, specs in ckb.pattern.items():
        found: list[str] = []
        for spec in specs:
            walk(spec.logic, found)
        lang_patterns.setdefault(lang, []).extend(found)

    pairs: list[tuple[str, str]] = []
    langs = sorted(lang_patterns)
    while len(pairs) < n_pairs:
        lang = rng.choice(langs)
        pattern = rng.choice(lang_patterns[lang])
        mode = rng.randrange(8)
        if mode == 0:  # satisfying instantiation
            text = _fill_pattern(pattern, lang, rng, consistent=True)
        elif mode == 1:  # unification violation (divergent fill)
            text = _fill_pattern(pattern, lang, rng, consistent=False)
        elif mode == 2:  # embedded in context — anchored match must reject
            core = _fill_pattern(pattern, lang, rng, consistent=True)
            text = rng.choice([f"if ({core}) {{}}", f"y = {core}", f"{core} ;", f"// {core}"])
        elif mode == 3:  # whitespace variants (outer stripped, inner not)
            core = _fill_pattern(pattern, lang, rng, consistent=True)
            text = rng.choice([f"  {core}  ", core.replace(" ", "  "), core.replace(" ", "")])
        elif mode == 4:  # cross-language identifier style
            other = rng.choice(langs)
            text = _fill_pattern(pattern, other, rng, consistent=True)
        elif mode == 5:  # noise / adversarial
            text = rng.choice(_NOISE_TEXTS)
        elif mode == 6:  # another pattern's instantiation
            other_p = rng.choice(lang_patterns[lang])
            text = _fill_pattern(other_p, lang, rng, consistent=True)
        else:  # one-char mutation of a satisfying instantiation
            core = _fill_pattern(pattern, lang, rng, consistent=True)
            if core:
                i = rng.randrange(len(core))
                text = core[:i] + rng.choice("xz=($") + core[i + 1 :]
            else:
                text = core
        pairs.append((pattern, text))
    return pairs


def run_reference_fallback(pairs: list[tuple[str, str]]) -> list[bool]:
    """One subprocess: load the reference ts_matcher by file path (stubs
    satisfy its tree-sitter imports) and run the pure textual fallback on
    every pair."""
    ensure_stubs()
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(pairs, f)
        in_path = f.name
    out_path = in_path + ".out"
    code = f"""
import importlib.util, json, sys
sys.path.insert(0, "/tmp/refstubs")
spec = importlib.util.spec_from_file_location("ref_ts_matcher", {REFERENCE_TS_MATCHER!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
M = mod.TreeSitterPatternMatcher
inst = object.__new__(M)  # skip __init__: the fallback never touches parser state
pairs = json.load(open({in_path!r}))
json.dump([bool(M._textual_match(inst, p, t)) for p, t in pairs], open({out_path!r}, "w"))
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=600)
    with open(out_path) as f:
        out = json.load(f)
    os.unlink(in_path)
    os.unlink(out_path)
    return out


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    pairs = generate_pairs(n_pairs, seed)
    ref = run_reference_fallback(pairs)
    ours = [bool(textual_match(p, t)) for p, t in pairs]
    divergences = [
        {"pattern": p, "text": t, "ref": r, "ours": o}
        for (p, t), r, o in zip(pairs, ref, ours)
        if r != o
    ]
    n_match = sum(1 for r, o in zip(ref, ours) if r and o)
    print(
        json.dumps(
            {
                "pairs": len(pairs),
                "both_matched": n_match,
                "divergences": len(divergences),
                "examples": divergences[:10],
            }
        )
    )
    return 1 if divergences else 0


if __name__ == "__main__":
    sys.exit(main())
