"""Semgrep-style boolean pattern tier.

Python path: structural AST matching with ``$X`` metavariable capture +
unification and ``...`` ellipsis list matching, reimplemented from the
reference semantics (plugins/pattern/matcher.py, plugins/pattern/plugin.py).

Non-Python path: the reference needs tree-sitter; in its absence we apply
the documented *textual fallback* semantics (plugins/pattern/ts_matcher.py:
73-102) to each expression-ish line of the file: metavariables become
identifier capture groups, repeated metavariables must unify.

Boolean logic evaluation (pattern AND / pattern-either OR / pattern-not NOT)
follows plugins/pattern/plugin.py:138-169.
"""

from __future__ import annotations

import ast
import re
from typing import Any, Dict, List, Optional

from ..kb.compile import CompiledKB, PATTERN_LANG_MAP

PLUGIN_NAME = "Pattern Matcher"

_MVAR_PREFIX = "__DRSPARK_MV_"
_ELLIPSIS = "__DRSPARK_ELLIPSIS__"
_MVAR_RE = re.compile(r"\$([A-Z_][A-Z0-9_]*)")


class _PyPattern:
    """One compiled Python pattern expression/statement."""

    def __init__(self, pattern: str):
        text = _MVAR_RE.sub(lambda m: f"{_MVAR_PREFIX}{m.group(1)}__", pattern)
        text = text.replace("...", _ELLIPSIS)
        self.tree: Optional[ast.AST] = None
        try:
            self.tree = ast.parse(text, mode="eval").body
        except (SyntaxError, TypeError):
            try:
                body = ast.parse(text, mode="exec").body
                self.tree = body[0] if body else None
            except SyntaxError:
                self.tree = None

    @staticmethod
    def _mvar_name(node: ast.AST) -> Optional[str]:
        if isinstance(node, ast.Name) and node.id.startswith(_MVAR_PREFIX):
            return node.id[len(_MVAR_PREFIX):]
        return None

    @staticmethod
    def _is_ellipsis(node: ast.AST) -> bool:
        return isinstance(node, ast.Name) and node.id == _ELLIPSIS

    @classmethod
    def _deep_equal(cls, a: Any, b: Any) -> bool:
        if type(a) is not type(b):
            return False
        if isinstance(a, ast.AST):
            for field, va in ast.iter_fields(a):
                if not cls._deep_equal(va, getattr(b, field, None)):
                    return False
            return True
        if isinstance(a, list):
            return len(a) == len(b) and all(cls._deep_equal(x, y) for x, y in zip(a, b))
        return a == b

    def match(self, node: ast.AST) -> bool:
        if self.tree is None:
            return False
        self._bindings: Dict[str, ast.AST] = {}
        return self._match(self.tree, node)

    def _match(self, pat: Any, tgt: Any) -> bool:
        if pat is None:
            return tgt is None
        if tgt is None:
            return False
        name = self._mvar_name(pat) if isinstance(pat, ast.AST) else None
        if name:
            if name in self._bindings:
                return self._deep_equal(self._bindings[name], tgt)
            self._bindings[name] = tgt
            return True
        if type(pat) is not type(tgt):
            return False
        for field, pval in ast.iter_fields(pat):
            tval = getattr(tgt, field, None)
            if isinstance(pval, list) and isinstance(tval, list):
                if not self._match_list(pval, tval):
                    return False
            elif isinstance(pval, ast.AST) and isinstance(tval, ast.AST):
                if not self._match(pval, tval):
                    return False
            elif pval != tval:
                return False
        return True

    def _match_list(self, pats: List[Any], tgts: List[Any]) -> bool:
        p = t = 0
        while p < len(pats):
            item = pats[p]
            if isinstance(item, ast.AST) and self._is_ellipsis(item):
                if p == len(pats) - 1:
                    return True
                for i in range(t, len(tgts) + 1):
                    if self._match_list(pats[p + 1:], tgts[i:]):
                        return True
                return False
            if t >= len(tgts):
                return False
            if not self._match(item, tgts[t]):
                return False
            p += 1
            t += 1
        return t == len(tgts)


_PY_PATTERN_MEMO: Dict[str, _PyPattern] = {}


def _py_pattern(pattern: str) -> _PyPattern:
    pat = _PY_PATTERN_MEMO.get(pattern)
    if pat is None:
        pat = _PyPattern(pattern)
        _PY_PATTERN_MEMO[pattern] = pat
    return pat


def textual_match(pattern: str, text: str) -> bool:
    """Textual fallback with metavariable unification
    (semantics of reference ts_matcher.py:73-102)."""
    regex_p = re.escape(pattern).replace(r"\.\.\.", r".*?")
    mvars = _MVAR_RE.findall(pattern)
    if not mvars:
        return pattern.strip() in text.strip()
    ident = r"(\$?[a-zA-Z_][a-zA-Z0-9_]*)"
    for mv in set(mvars):
        regex_p = regex_p.replace(re.escape(f"${mv}"), ident)
    try:
        m = re.search(f"^{regex_p}$", text.strip())
    except re.error:
        return False
    if not m:
        return False
    groups = m.groups()
    if len(groups) > 1 and len(mvars) > 1 and mvars[0] == mvars[1] and groups[0] != groups[1]:
        return False
    return True


def _eval_logic_py(node: ast.AST, logic: Any) -> bool:
    if isinstance(logic, str):
        return _py_pattern(logic).match(node)
    if not isinstance(logic, dict):
        return False
    if "pattern" in logic and not _eval_logic_py(node, logic["pattern"]):
        return False
    if "patterns" in logic:
        for sub in logic["patterns"]:
            if not _eval_logic_py(node, sub):
                return False
    if "pattern-either" in logic:
        if not any(_eval_logic_py(node, sub) for sub in logic["pattern-either"]):
            return False
    if "pattern-not" in logic and _eval_logic_py(node, logic["pattern-not"]):
        return False
    return True


def _eval_logic_text(text: str, logic: Any) -> bool:
    if isinstance(logic, str):
        return textual_match(logic, text)
    if not isinstance(logic, dict):
        return False
    if "pattern" in logic and not _eval_logic_text(text, logic["pattern"]):
        return False
    if "patterns" in logic:
        for sub in logic["patterns"]:
            if not _eval_logic_text(text, sub):
                return False
    if "pattern-either" in logic:
        if not any(_eval_logic_text(text, sub) for sub in logic["pattern-either"]):
            return False
    if "pattern-not" in logic and _eval_logic_text(text, logic["pattern-not"]):
        return False
    return True


def analyze_pattern(content: str, ext: str, ckb: CompiledKB, tree=None) -> List[Dict[str, Any]]:
    """tree: optional pre-parsed python AST of ``content`` — the analyze
    stage shares one parse with the python taint tier."""
    lang = PATTERN_LANG_MAP.get(ext)
    if lang is None:
        return []
    specs = ckb.pattern.get(lang, [])
    if not specs:
        return []
    findings: List[Dict[str, Any]] = []

    if lang == "python":
        if tree is None:
            try:
                tree = ast.parse(content)
            except (SyntaxError, ValueError):
                return []
        # NB: the reference materializes ast.walk once and exhausts it on the
        # first pattern category (pattern/plugin.py:93 — generator bug); with
        # the default KB only one category has logic, so behavior matches.
        nodes = list(ast.walk(tree))
        for spec in specs:
            for node in nodes:
                if _eval_logic_py(node, spec.logic):
                    findings.append(_mk(spec, getattr(node, "lineno", 1)))
            break  # reference generator exhaustion: later categories see no nodes
    else:
        # Textual fallback granularity: candidate expressions per line — the
        # stripped line, the contents of its outermost parens, and the line
        # with a leading control keyword / trailing block opener removed
        # (stands in for the tree-sitter expression nodes the reference
        # walks; swapped for real parser nodes in the structural tiers).
        for line_num, raw in enumerate(content.split("\n"), 1):
            text = raw.strip().rstrip(";").strip()
            if not text or text.startswith(("#", "//", "/*", "*", "<?", "?>")):
                continue
            for spec in specs:
                if any(_eval_logic_text(cand, spec.logic) for cand in _candidates(text)):
                    findings.append(_mk(spec, line_num))
    return findings


_KEYWORDS = ("if", "while", "unless", "elsif", "elseif", "return", "until")


def _candidates(text: str) -> List[str]:
    out = [text]
    lp, rp = text.find("("), text.rfind(")")
    if 0 <= lp < rp:
        out.append(text[lp + 1 : rp].strip())
    stripped = text
    for kw in _KEYWORDS:
        if stripped.startswith(kw + " ") or stripped.startswith(kw + "("):
            stripped = stripped[len(kw):].strip()
            break
    stripped = stripped.rstrip("{").rstrip()
    if stripped and stripped not in out:
        out.append(stripped)
        lp, rp = stripped.find("("), stripped.rfind(")")
        if 0 <= lp < rp:
            inner = stripped[lp + 1 : rp].strip()
            if inner not in out:
                out.append(inner)
    return out


def _mk(spec, line: int) -> Dict[str, Any]:
    return {
        "vuln_type": f"{spec.vuln_type} (Pattern)",
        "message": spec.message,
        "severity": spec.severity,
        "line": line,
        "plugin": PLUGIN_NAME,
        "trace": [],
        "rule_id": None,
        "variable": None,
        "sink": None,
        "source": None,
        "base_type": spec.vuln_type,
    }
