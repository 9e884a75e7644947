"""Regex line-scan tier, executor side.

Reimplements the reference regex detector (plugins/regex/plugin.py:17-89):
KB general + language-specific patterns, scanned per line, first match per
(rule_id, line) wins, rule-level severity defaulting to MEDIUM (observed:
the category severity is NOT consulted), message ``({id}) {message}``.

Patterns are compiled once per executor process (module-level memo keyed by
pattern string) from the broadcast CompiledKB — the reference recompiles
every pattern for every file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from ..kb.compile import CompiledKB, REGEX_LANG_MAP

PLUGIN_NAME = "General Regex Analyzer"  # part of finding identity

_COMPILE_MEMO: Dict[str, Optional[re.Pattern]] = {}


def _compiled(pattern: str) -> Optional[re.Pattern]:
    pat = _COMPILE_MEMO.get(pattern, False)
    if pat is not False:
        return pat
    try:
        compiled = re.compile(pattern)
    except re.error:
        compiled = None
    _COMPILE_MEMO[pattern] = compiled
    return compiled


# combined-alternation line screen: one C-level search decides whether ANY
# rule could match the line before the per-rule loop runs. Exact, because
# the screen is the union of the very same patterns (matching is .search
# truthiness only — no group numbering to disturb). Patterns that are
# unsafe to embed in an alternation — backrefs, named groups, conditional
# group references like (?(1)yes|no) (whose referenced group NUMBER shifts
# when other rules' capture groups precede them in the combined pattern),
# non-leading inline flags — stay outside the screen and are checked on
# every line.
_UNSAFE_IN_ALTERNATION = re.compile(r"\\[1-9]|\(\?P[<=]|\(\?\(|(?<!^)\(\?[a-zA-Z]+\)")

_SCREEN_MEMO: Dict[tuple, tuple] = {}


def _screen_for(rules) -> tuple:
    """→ (combined_pattern_or_None, always_check_rules)."""
    key = tuple(r.pattern for r in rules)
    hit = _SCREEN_MEMO.get(key)
    if hit is not None:
        return hit
    parts, always = [], []
    for r in rules:
        p = r.pattern
        if _compiled(p) is None or _UNSAFE_IN_ALTERNATION.search(p):
            always.append(r)
            continue
        parts.append("(?i:" + p[4:] + ")" if p.startswith("(?i)") else "(?:" + p + ")")
    combined = None
    if parts:
        try:
            combined = re.compile("|".join(parts))
        except re.error:  # defensive: a user overlay the transform mishandles
            combined, always = None, list(rules)
    out = (combined, always)
    _SCREEN_MEMO[key] = out
    return out


def analyze_regex(content: str, ext: str, ckb: CompiledKB) -> List[Dict[str, Any]]:
    lang = REGEX_LANG_MAP.get(ext)
    rules = ckb.regex_rules_for_lang(lang)
    if not rules:
        return []
    screen, always_rules = _screen_for(rules)
    findings: List[Dict[str, Any]] = []
    for line_num, line in enumerate(content.split("\n"), 1):
        if screen is not None and not screen.search(line):
            check = always_rules
            if not check:
                continue
        else:
            check = rules
        for rule in check:
            pat = _compiled(rule.pattern)
            if pat is not None and pat.search(line):
                findings.append(
                    {
                        "vuln_type": rule.vuln_type,
                        "message": f"({rule.rule_id}) {rule.message}",
                        "severity": rule.severity,
                        "line": line_num,
                        "plugin": PLUGIN_NAME,
                        "trace": [],
                        "rule_id": rule.rule_id,
                        "variable": None,
                        "sink": None,
                        "source": None,
                        "base_type": rule.vuln_type,
                    }
                )
    return findings
