"""PHP intra-file taint analysis (reference plugins/php/taint_visitor.py +
plugin.py semantics):

* paths: `$var`, `$obj->field`, `$arr[]` (subscript collapses to `base[]`,
  taint_visitor.py:42-47) with base-fallback lookups;
* sources matched exact or by prefix (`$_GET[]` startswith `$_GET`);
* sinks: ONLY plain function calls match (member calls `$o->m()` are a
  different node type the reference never checks) — exact name only, no
  suffix logic (taint_visitor.py:127-131);
* `echo` and include/require are special-cased sinks (taint_visitor.py:
  133-144);
* literal/constant sink arguments are suppressed (taint_visitor.py:182);
* double-quoted strings (incl. interpolated) are CONSTANTS for assignment
  resolution ("encapsed_string" in _resolve_value, taint_visitor.py:76);
* scopes push on function/method definitions only;
* message `Sink function '{sink}' called with tainted var '{var}'`
  (plugin.py:69), category severity; no project index (plugin has no
  ``index`` hook).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..kb.compile import TaintSpec
from ..parsers.phpparse import interp_vars, parse_php

PII_NAMES = ("password", "email", "secret", "token", "credit_card", "cc", "ssn")


def _path(node: Optional[Dict]) -> Optional[str]:
    if node is None:
        return None
    t = node["t"]
    if t == "name" and node["id"].startswith("$"):
        return node["id"]
    if t == "member":
        base = _path(node["obj"])
        return f"{base}->{node['prop']}" if base else None
    if t == "index":
        base = _path(node["obj"])
        return f"{base}[]" if base else None
    return None


def _idents(node: Optional[Any], out: Optional[List[str]] = None) -> List[str]:
    if out is None:
        out = []
    if node is None or not isinstance(node, dict):
        return out
    p = _path(node)
    if p is not None and p not in out:
        out.append(p)
    t = node["t"]
    if t == "lit" and node.get("interp"):
        for v in interp_vars(node["val"]):
            if v not in out:
                out.append(v)
    for key in ("obj", "idx", "l", "r", "e", "c", "a", "b", "target", "value", "callee", "ctor", "arg"):
        if key in node:
            _idents(node[key], out)
    for key in ("args", "items"):
        for child in node.get(key, []) or []:
            _idents(child, out)
    return out


class PhpTaintEngine:
    def __init__(self, spec: TaintSpec):
        self.spec = spec
        self.sources = set(spec.sources)
        self.sanitizers = set(spec.sanitizers)
        self.sink_args: Dict[str, Optional[List[int]]] = {n: a for n, a in spec.sinks}
        self.scopes: List[Dict[str, Dict]] = [{}]
        self.consts: List[Dict[str, Any]] = [{}]
        self.hits: List[Dict[str, Any]] = []

    def lookup_taint(self, path: str) -> Optional[Dict]:
        for scope in reversed(self.scopes):
            if path in scope:
                return scope[path]
            if "->" in path:
                base = path.split("->")[0]
                if base in scope:
                    return scope[base]
            if "[]" in path:
                base = path.split("[]")[0]
                if base in scope:
                    return scope[base]
        return None

    def lookup_const(self, path: str) -> Any:
        for scope in reversed(self.consts):
            if path in scope:
                return scope[path]
        return None

    def taint(self, path: str, info: Dict) -> None:
        self.scopes[-1][path] = info
        self.consts[-1].pop(path, None)

    def untaint(self, path: str) -> None:
        self.scopes[-1].pop(path, None)

    def _const_value(self, node: Optional[Dict]) -> Any:
        if node is None:
            return None
        # string (single OR double-quoted/interpolated), integer → constant
        if node["t"] == "lit" and node["kind"] in ("str", "num"):
            return node["val"]
        p = _path(node)
        if p:
            return self.lookup_const(p)
        return None

    def _classify(self, node: Dict, var_name: Optional[str] = None):
        if var_name:
            clean = var_name.lower().replace("$", "")
            if any(x in clean for x in PII_NAMES):
                return "source", f"Sensitive variable name: {var_name}"
        name = ""
        if node["t"] == "call":
            callee = node["callee"]
            if callee["t"] == "name":
                name = callee["id"]
        else:
            p = _path(node)
            if p:
                name = p
        if not name:
            return None, None
        if name in self.sanitizers:
            return "sanitizer", name
        if name in self.sources or any(name.startswith(s) for s in self.sources):
            return "source", name
        return None, None

    # -- per-node state transitions (traversal lives in _PhpWalker) -----------

    def _push_scope_raw(self) -> None:
        # scope push on function_definition (taint_visitor.py:115-119)
        self.scopes.append({})
        self.consts.append({})

    def _pop_scope_raw(self) -> None:
        self.consts.pop()
        self.scopes.pop()

    def _echo_sink(self, s: Dict) -> None:
        if "echo" in self.sink_args:
            vuln_args = self.sink_args["echo"]
            for idx, arg in enumerate(s["args"]):
                if vuln_args is not None and idx not in vuln_args:
                    continue
                self._check_node(arg, "echo", s["line"])

    def _include_sink(self, kw: str, arg: Optional[Dict], line: int) -> None:
        if kw in self.sink_args and arg is not None:
            self._check_node(arg, kw, line)

    def _call_sink(self, e: Dict) -> None:
        callee = e["callee"]
        if callee["t"] == "name" and callee["id"] in self.sink_args:
            vuln_args = self.sink_args[callee["id"]]
            for idx, arg in enumerate(e["args"]):
                if vuln_args is not None and idx not in vuln_args:
                    continue
                self._check_node(arg, callee["id"], e["line"])

    def _assign(self, path: str, value: Dict, line: int) -> None:
        kind, name = self._classify(value, var_name=path)
        if kind == "sanitizer":
            self.untaint(path)
            return
        if kind == "source":
            self.taint(path, {"source": name, "trace": [f"Tainted by {name} at line {line}"]})
            return
        if self._const_value(value) is not None:
            self.consts[-1][path] = self._const_value(value)
            self.untaint(path)
            return
        for ident in _idents(value):
            info = self.lookup_taint(ident)
            if info:
                self.taint(path, {"source": info["source"], "trace": info["trace"] + [f"Propagated to {path} at line {line}"]})
                return
        self.untaint(path)

    def _check_node(self, node: Dict, sink_name: str, line: int) -> None:
        if self._const_value(node) is not None:
            return  # literal args are safe (taint_visitor.py:182)
        for path in _idents(node):
            info = self.lookup_taint(path)
            if info:
                self.hits.append({"sink": sink_name, "variable": path, "line": line, "trace": info["trace"]})
                break


class _PhpWalker:
    """ONE traversal driving N per-category engines in lockstep (the same
    fusion as the Python tier's _MultiWalk)."""

    def __init__(self, engines: List["PhpTaintEngine"]):
        self.engines = engines

    def run(self, program: Dict) -> None:
        for s in program.get("stmts", []):
            self.visit_stmt(s)

    def visit_stmt(self, s: Optional[Dict]) -> None:
        if s is None:
            return
        t = s["t"]
        if t == "block":
            for x in s["stmts"]:
                self.visit_stmt(x)
        elif t == "func":
            for e in self.engines:
                e._push_scope_raw()
            for x in s["body"]["stmts"]:
                self.visit_stmt(x)
            for e in self.engines:
                e._pop_scope_raw()
        elif t == "echo":
            for e in self.engines:
                e._echo_sink(s)
            for arg in s["args"]:
                self.visit_expr(arg)
        elif t == "include":
            for e in self.engines:
                e._include_sink(s["kw"], s.get("arg"), s["line"])
            self.visit_expr(s.get("arg"))
        elif t == "ctrl":
            for c in s.get("cond", []):
                self.visit_expr(c)
            self.visit_stmt(s.get("body"))
        elif t == "ret":
            self.visit_expr(s.get("e"))
        elif t == "exprstmt":
            self.visit_expr(s.get("e"))

    def visit_expr(self, e: Optional[Any]) -> None:
        if e is None or not isinstance(e, dict):
            return
        t = e["t"]
        if t == "assign":
            p = _path(e["target"])
            if p and e.get("value") is not None:
                for eng in self.engines:
                    eng._assign(p, e["value"], e["line"])
            self.visit_expr(e.get("value"))
        elif t == "call":
            for eng in self.engines:
                eng._call_sink(e)
            for a in e["args"]:
                self.visit_expr(a)
        elif t == "includeexpr":
            for eng in self.engines:
                eng._include_sink(e["kw"], e.get("arg"), e["line"])
            self.visit_expr(e.get("arg"))
        elif t == "mcall":
            # member calls are NOT sinks in the reference
            self.visit_expr(e["obj"])
            for a in e["args"]:
                self.visit_expr(a)
        elif t == "binary":
            self.visit_expr(e["l"])
            self.visit_expr(e["r"])
        elif t in ("unary",):
            self.visit_expr(e["e"])
        elif t == "new":
            for a in e.get("args", []):
                self.visit_expr(a)
        elif t == "index":
            self.visit_expr(e["obj"])
            self.visit_expr(e["idx"])
        elif t == "ternary":
            self.visit_expr(e["c"])
            self.visit_expr(e["a"])
            self.visit_expr(e["b"])


PLUGIN_NAME = "PHP AST Analyzer (Tree-sitter)"


def analyze_php(content: str, taint_specs: List[TaintSpec]) -> List[Dict[str, Any]]:
    """Parse once, ONE fused walk for all eligible categories (the reference
    re-parses and re-walks per category)."""
    if not taint_specs:
        # all categories screened out (or none eligible): no engine could
        # emit a hit, so skip the parse AND the walk entirely
        return []
    try:
        program = parse_php(content)
    except (RecursionError, MemoryError):
        return []
    engines = [PhpTaintEngine(spec) for spec in taint_specs]
    try:
        _PhpWalker(engines).run(program)
    except RecursionError:
        engines = []
    findings: List[Dict[str, Any]] = []
    for engine in engines:
        spec = engine.spec
        for hit in engine.hits:
            findings.append(
                {
                    "vuln_type": f"{spec.vuln_type} (AST Taint)",
                    "message": f"Sink function '{hit['sink']}' called with tainted var '{hit['variable']}'",
                    "severity": spec.severity,
                    "line": hit["line"],
                    "plugin": PLUGIN_NAME,
                    "trace": hit["trace"],
                    "rule_id": None,
                    "variable": hit["variable"],
                    "sink": hit["sink"],
                    "source": hit["trace"][0] if hit["trace"] else None,
                    "base_type": spec.vuln_type,
                }
            )
    return findings
