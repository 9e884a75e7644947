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


def analyze_regex(content: str, ext: str, ckb: CompiledKB) -> List[Dict[str, Any]]:
    lang = REGEX_LANG_MAP.get(ext)
    rules = ckb.regex_rules_for_lang(lang)
    if not rules:
        return []
    findings: List[Dict[str, Any]] = []
    for line_num, line in enumerate(content.split("\n"), 1):
        for rule in rules:
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
