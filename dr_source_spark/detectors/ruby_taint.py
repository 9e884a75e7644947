"""Ruby intra-file taint analysis (reference plugins/ruby/taint_visitor.py +
plugin.py semantics):

* every dotted access is a call; paths are `recv.method` / `base[]`;
* DIRECT-SOURCE usage: a path whose base is a known source is tainted even
  without a prior assignment — trace `Direct usage of source {path}`
  (taint_visitor.py:59-63);
* interpolated strings defeat constant resolution (taint_visitor.py:81-86);
* sink match: method == sink, method.endswith('.'+sink), or
  sink.endswith('.'+method) — bidirectional suffix (taint_visitor.py:146-151);
* paren-less call arguments are checked like parenthesized ones
  (taint_visitor.py:182-189);
* literal/constant sink args suppressed (taint_visitor.py:197);
* scopes push on method and do/brace blocks; message
  `Sink method '{sink}' called with tainted var '{var}'` (plugin.py:69).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..kb.compile import TaintSpec
from ..parsers.rubyparse import parse_ruby

PII_NAMES = ("password", "email", "secret", "token", "credit_card", "cc", "ssn")


def _path(node: Optional[Dict]) -> Optional[str]:
    if node is None:
        return None
    t = node["t"]
    if t == "name":
        return node["id"]
    if t == "rcall":
        if node.get("recv") is not None:
            base = _path(node["recv"])
            return f"{base}.{node['name']}" if base else None
        return None
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
    if t == "lit":
        for part in node.get("parts", []) or []:
            _idents(part, out)
        return out
    if t == "rcall":
        _idents(node.get("recv"), out)
        if node["name"] not in out:
            out.append(node["name"])
        for a in node.get("args", []):
            _idents(a, out)
        return out
    for key in ("obj", "idx", "l", "r", "e", "target", "value", "c", "a", "b"):
        if key in node:
            _idents(node[key], out)
    for key in ("args", "items"):
        for child in node.get(key, []) or []:
            _idents(child, out)
    return out


class RubyTaintEngine:
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
            if "." in path:
                base = path.split(".")[0]
                if base in scope:
                    return scope[base]
            if "[]" in path:
                base = path.split("[]")[0]
                if base in scope:
                    return scope[base]
        clean = path.split("[]")[0].split(".")[0]
        if clean in self.sources:
            return {"source": clean, "trace": [f"Direct usage of source {path}"]}
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
        if node["t"] == "lit":
            if node["kind"] == "str" and node.get("interp"):
                return None  # interpolation defeats constants
            if node["kind"] in ("str", "num", "sym"):
                return node["val"].strip("'\":")
        p = _path(node)
        if p:
            return self.lookup_const(p)
        return None

    def _classify(self, node: Dict, var_name: Optional[str] = None):
        if var_name:
            clean = var_name.lower().replace("@", "")
            if any(x in clean for x in PII_NAMES):
                return "source", f"Sensitive variable name: {var_name}"
        name = ""
        if node["t"] == "rcall":
            name = node["name"]
        elif node["t"] == "name":
            name = node["id"]
        elif node["t"] == "index":
            base = node["obj"]
            if base is not None and base["t"] == "name":
                name = base["id"]
        if not name:
            return None, None
        if name in self.sanitizers:
            return "sanitizer", name
        if name in self.sources or any(name.startswith(s) for s in self.sources):
            return "source", name
        return None, None

    # -- per-node state transitions (traversal lives in _RubyWalker) ----------

    def _push_scope_raw(self) -> None:
        # scope push on method and do/brace blocks (taint_visitor.py)
        self.scopes.append({})
        self.consts.append({})

    def _pop_scope_raw(self) -> None:
        self.consts.pop()
        self.scopes.pop()

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

    def _handle_call(self, call: Dict) -> None:
        method = call["name"]
        match_name = None
        if method in self.sink_args:
            match_name = method
        else:
            for s in self.sink_args:
                if method == s or method.endswith("." + s) or s.endswith("." + method):
                    match_name = s
                    break
        if not match_name:
            return
        vuln_args = self.sink_args[match_name]
        for idx, arg in enumerate(call.get("args", [])):
            if vuln_args is not None and idx not in vuln_args:
                continue
            if self._const_value(arg) is not None:
                continue
            for path in _idents(arg):
                info = self.lookup_taint(path)
                if info:
                    self.hits.append({"sink": match_name, "variable": path, "line": call["line"], "trace": info["trace"]})
                    break


class _RubyWalker:
    """ONE traversal driving N per-category engines in lockstep (the same
    fusion as the Python tier's _MultiWalk)."""

    def __init__(self, engines: List["RubyTaintEngine"]):
        self.engines = engines

    def run(self, program: Dict) -> None:
        for s in program.get("stmts", []):
            self.visit_stmt(s)

    def _scoped(self, stmts: List[Dict]) -> None:
        for e in self.engines:
            e._push_scope_raw()
        for x in stmts:
            self.visit_stmt(x)
        for e in self.engines:
            e._pop_scope_raw()

    def visit_stmt(self, s: Optional[Dict]) -> None:
        if s is None:
            return
        t = s["t"]
        if t in ("container", "block"):
            for x in s["stmts"]:
                self.visit_stmt(x)
        elif t == "method":
            self._scoped(s["body"]["stmts"])
        elif t == "doblock":
            self._scoped(s["stmts"])
        elif t == "ctrl":
            for c in s.get("cond", []):
                self.visit_expr(c)
            self.visit_stmt(s.get("body"))
        elif t == "ret":
            self.visit_expr(s.get("e"))
        elif t == "exprstmt":
            self.visit_expr(s.get("e"))
            if s.get("doblock") is not None:
                self.visit_stmt(s["doblock"])

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
        elif t == "rcall":
            for eng in self.engines:
                eng._handle_call(e)
            self.visit_expr(e.get("recv"))
            for a in e.get("args", []):
                self.visit_expr(a)
        elif t == "binary":
            self.visit_expr(e["l"])
            self.visit_expr(e["r"])
        elif t == "unary":
            self.visit_expr(e["e"])
        elif t == "index":
            self.visit_expr(e["obj"])
            self.visit_expr(e["idx"])
        elif t == "lit":
            for part in e.get("parts", []) or []:
                self.visit_expr(part)
        elif t == "arraylit":
            for v in e["items"]:
                self.visit_expr(v)
        elif t == "ternary":
            self.visit_expr(e["c"])
            self.visit_expr(e["a"])
            self.visit_expr(e["b"])


PLUGIN_NAME = "Ruby AST Analyzer (Tree-sitter)"


def analyze_ruby(content: str, taint_specs: List[TaintSpec]) -> List[Dict[str, Any]]:
    """Parse once, ONE fused walk for all eligible categories (the reference
    re-parses and re-walks per category)."""
    if not taint_specs:
        # all categories screened out (or none eligible): no engine could
        # emit a hit, so skip the parse AND the walk entirely
        return []
    try:
        program = parse_ruby(content)
    except (RecursionError, MemoryError):
        return []
    engines = [RubyTaintEngine(spec) for spec in taint_specs]
    try:
        _RubyWalker(engines).run(program)
    except RecursionError:
        engines = []
    findings: List[Dict[str, Any]] = []
    for engine in engines:
        spec = engine.spec
        for hit in engine.hits:
            findings.append(
                {
                    "vuln_type": f"{spec.vuln_type} (AST Taint)",
                    "message": f"Sink method '{hit['sink']}' called with tainted var '{hit['variable']}'",
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
