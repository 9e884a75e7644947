"""Python intra-file taint analysis (stdlib ``ast``), reimplemented from
scratch against the observed behavior of the reference's Python tier
(reference plugins/python/taint_visitor.py + plugin.py; behavior pinned by
running the reference on its fixtures — tests/goldens/).

Semantics intentionally preserved, including reference quirks that are part
of finding identity (SURVEY.md §2B B16, §7):

* source matching is exact OR ``.``-suffix OR *substring* containment
  (python/taint_visitor.py:157);
* sanitizer matching uses the last dotted segment;
* PII variable/parameter names (substring) self-taint
  (python/taint_visitor.py:28,112-114,130-133);
* constants (literals, constant-var lookups, folded ``+`` of str) suppress
  taint (python/taint_visitor.py:73-81,141-143);
* whole-object taint covers sub-fields (base fallback in
  ``lookup_taint``, python/taint_visitor.py:50-56);
* framework mappers are INERT in the taint pass — the reference filters out
  every mapper because the base class defines ``analyze_node``
  (python/plugin.py:51); observed: no FastAPI/Django-sourced findings;
* locally-defined functions are registered but never simulated — only
  project-index (cross-file) callees are (python/taint_visitor.py:184-189);
  the stock reference never wires a project index into this tier
  (plugin lacks the ``project_index`` attribute, scanner.py:170-173), so
  parity runs pass ``fn_index=None``. Our pipeline can wire one in as an
  opt-in extension.
* taint severity is always HIGH (python/plugin.py:64), structural findings
  are HIGH (python/plugin.py:37) — observed, even for CRITICAL categories.

One difference by design: identifier collection returns a deterministic
document-order list (the reference iterates a ``set`` whose order depends on
the process hash seed when an argument holds several tainted names).
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Optional, Tuple

from ..kb.compile import TaintSpec

PII_NAMES = ("password", "email", "secret", "token", "credit_card", "cc", "ssn")
MAX_CALL_DEPTH = 3  # reference python/taint_visitor.py:14


def _attr_path(node: ast.AST) -> Optional[str]:
    """Dotted path for Name/Attribute chains, None otherwise."""
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Attribute):
        base = _attr_path(node.value)
        return f"{base}.{node.attr}" if base else None
    return None


def _call_path(node: ast.Call) -> str:
    def resolve(n: ast.AST) -> str:
        if isinstance(n, ast.Name):
            return n.id
        if isinstance(n, ast.Attribute):
            base = resolve(n.value)
            return f"{base}.{n.attr}" if base else f"UNKNOWN.{n.attr}"
        if isinstance(n, ast.Call):
            return resolve(n.func)
        return "UNKNOWN"

    if isinstance(node.func, ast.Name):
        return node.func.id
    if isinstance(node.func, ast.Attribute):
        return resolve(node.func)
    return "UNKNOWN_CALL"


def _ordered_idents(node: Optional[ast.AST]) -> List[str]:
    """All Name ids and Attribute dotted paths under ``node``, document
    order, de-duplicated preserving first occurrence."""
    if node is None:
        return []
    seen: Dict[str, None] = {}
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            seen.setdefault(n.id, None)
        elif isinstance(n, ast.Attribute):
            p = _attr_path(n)
            if p:
                seen.setdefault(p, None)
    return list(seen)


class PyTaintEngine(ast.NodeVisitor):
    """One category's source→sink walk over one parsed module."""

    def __init__(
        self,
        spec: TaintSpec,
        fn_index: Optional[Any] = None,
        depth: int = 0,
        seed_scope: Optional[Dict[str, Dict[str, Any]]] = None,
    ):
        self.sources = set(spec.sources)
        self.sanitizers = {s.split(".")[-1] for s in spec.sanitizers}
        self.sink_args: Dict[str, Optional[List[int]]] = {name: args for name, args in spec.sinks}
        self.spec = spec
        self.fn_index = fn_index
        self.depth = depth
        self.scopes: List[Dict[str, Dict[str, Any]]] = [seed_scope if seed_scope is not None else {}]
        self.consts: List[Dict[str, Any]] = [{}]
        self.hits: List[Dict[str, Any]] = []
        self.local_fns: Dict[str, ast.AST] = {}

    # -- taint/constant state ------------------------------------------------

    def lookup_taint(self, path: str) -> Optional[Dict[str, Any]]:
        for scope in reversed(self.scopes):
            if path in scope:
                return scope[path]
            if "." in path:
                base = path.split(".")[0]
                if base in scope:
                    return scope[base]
        return None

    def lookup_const(self, path: str) -> Any:
        for scope in reversed(self.consts):
            if path in scope:
                return scope[path]
        return None

    def taint(self, path: str, info: Dict[str, Any]) -> None:
        self.scopes[-1][path] = info
        self.consts[-1].pop(path, None)

    def untaint(self, path: str) -> None:
        self.scopes[-1].pop(path, None)

    # -- value/source classification ------------------------------------------

    def _const_value(self, node: ast.AST) -> Any:
        if isinstance(node, ast.Constant):
            return node.value
        path = _attr_path(node)
        if path:
            return self.lookup_const(path)
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            left, right = self._const_value(node.left), self._const_value(node.right)
            if isinstance(left, str) and isinstance(right, str):
                return left + right
        return None

    def _classify(self, node: ast.AST) -> Tuple[Optional[str], Optional[str]]:
        """('source'|'sanitizer'|None, matched name)."""
        name = _call_path(node) if isinstance(node, ast.Call) else (_attr_path(node) or "")
        if not name:
            return None, None
        if name in self.sanitizers or name.split(".")[-1] in self.sanitizers:
            return "sanitizer", name
        if (
            name in self.sources
            or any(name.endswith("." + s) for s in self.sources)
            or any(s in name for s in self.sources)  # substring quirk
        ):
            return "source", name
        return None, None

    # -- visitors --------------------------------------------------------------

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._enter_function(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._enter_function(node)

    def _enter_function(self, node: Any) -> None:
        self.local_fns[node.name] = node
        self.scopes.append({})
        self.consts.append({})
        for arg in node.args.args:
            if any(p in arg.arg.lower() for p in PII_NAMES):
                self.taint(
                    arg.arg,
                    {
                        "source": f"Sensitive parameter: {arg.arg}",
                        "trace": [f"Sensitive data in parameter {arg.arg} at line {node.lineno}"],
                    },
                )
        self.generic_visit(node)
        self.consts.pop()
        self.scopes.pop()

    def visit_Assign(self, node: ast.Assign) -> None:
        if node.targets:
            path = _attr_path(node.targets[0])
            if path:
                self._assign(path, node.value, node.lineno)
        self.generic_visit(node)

    def _assign(self, path: str, value: ast.AST, line: int) -> None:
        # PII name heuristic beats everything else (python/taint_visitor.py:129-133)
        tail = path.lower().split(".")[-1]
        if any(p in tail for p in PII_NAMES):
            self.taint(
                path,
                {
                    "source": f"Sensitive variable name: {path}",
                    "trace": [f"Variable {path} marked as sensitive at line {line}"],
                },
            )
            return

        kind, name = self._classify(value)
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

        for ident in _ordered_idents(value):
            info = self.lookup_taint(ident)
            if info:
                self.taint(
                    path,
                    {"source": info["source"], "trace": info["trace"] + [f"Propagated to {path} at line {line}"]},
                )
                return
        self.untaint(path)

    def visit_Call(self, node: ast.Call) -> None:
        self._handle_call_node(node)
        self.generic_visit(node)

    def _handle_call_node(self, node: ast.Call) -> None:
        fn = _call_path(node)
        matched = None
        if fn in self.sink_args:
            matched = fn
        else:
            for sink_name in self.sink_args:
                if fn.endswith("." + sink_name) or fn == sink_name:
                    matched = sink_name
                    break
        if matched:
            arg_filter = self.sink_args[matched]
            for idx, arg in enumerate(node.args):
                if arg_filter is not None and idx not in arg_filter:
                    continue
                for ident in _ordered_idents(arg):
                    info = self.lookup_taint(ident)
                    if info:
                        self.hits.append({"sink": matched, "variable": ident, "line": node.lineno, "trace": info["trace"]})
                        break
            for kw in node.keywords:
                for ident in _ordered_idents(kw.value):
                    info = self.lookup_taint(ident)
                    if info:
                        self.hits.append({"sink": matched, "variable": ident, "line": node.lineno, "trace": info["trace"]})
                        break
        else:
            # Only project-index callees are simulated; locally-registered
            # functions are not (reference python/taint_visitor.py:184-189).
            if fn not in self.local_fns and self.fn_index is not None and self.depth < MAX_CALL_DEPTH:
                entry = self.fn_index.get(fn) if hasattr(self.fn_index, "get") else None
                if entry and entry.get("lang") == "python":
                    self._simulate(node, entry, fn)

    def _simulate(self, call: ast.Call, entry: Dict[str, Any], fn: str) -> None:
        """Bind tainted actuals to formals and walk the callee body
        (cross-file hop; reference python/taint_visitor.py:192-212)."""
        import os
        import textwrap

        # pad so callee line numbers are absolute in the defining file
        # (reference keeps the original ast node, project_index registration)
        pad = "\n" * max(0, int(entry.get("def_line", 1)) - 1)
        try:
            f_def = ast.parse(pad + textwrap.dedent(entry["def_source"])).body[0]
        except (SyntaxError, IndexError, ValueError):
            return
        if not isinstance(f_def, (ast.FunctionDef, ast.AsyncFunctionDef)):
            return
        params = [a.arg for a in f_def.args.args]
        seeded: Dict[str, Dict[str, Any]] = {}
        for idx, arg in enumerate(call.args):
            if idx >= len(params):
                break
            for ident in _ordered_idents(arg):
                info = self.lookup_taint(ident)
                if info:
                    loc = f"in {os.path.basename(entry['path'])}"
                    seeded[params[idx]] = {
                        "source": info["source"],
                        "trace": info["trace"] + [f"Passed to {fn}() {loc} at line {call.lineno}"],
                    }
                    break
        if seeded:
            sub = PyTaintEngine(self.spec, self.fn_index, self.depth + 1, seed_scope=seeded)
            sub.visit(f_def)
            self.hits.extend(sub.hits)


def find_django_mass_assignment(tree: ast.AST) -> List[Dict[str, Any]]:
    """Structural check: Django ModelForm Meta ``fields = '__all__'``
    (reference plugins/python/frameworks.py:49-68; reported as vuln_type
    MASS_ASSIGNMENT, message = the structural message, severity HIGH)."""
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        if not any(isinstance(b, ast.Attribute) and b.attr == "ModelForm" for b in node.bases):
            continue
        for item in node.body:
            if isinstance(item, ast.ClassDef) and item.name == "Meta":
                for meta_item in item.body:
                    if isinstance(meta_item, ast.Assign):
                        for target in meta_item.targets:
                            if (
                                isinstance(target, ast.Name)
                                and target.id == "fields"
                                and isinstance(meta_item.value, ast.Constant)
                                and meta_item.value.value == "__all__"
                            ):
                                out.append(
                                    {
                                        "vuln_type": "MASS_ASSIGNMENT",
                                        "message": "Django ModelForm with fields = '__all__' is vulnerable to mass assignment.",
                                        "line": meta_item.lineno,
                                    }
                                )
    return out


class _MultiWalk:
    """Drive K category engines through ONE AST traversal.

    Semantics-preserving fusion of the reference's per-category re-walk
    (SURVEY.md §4 R6): every engine sees the identical pre-order event
    stream `ast.NodeVisitor` would produce — node handler first, children
    after, function scopes popped on exit — while the (shared) traversal
    cost is paid once. Engines keep fully independent scope/const state;
    call simulation recursion stays inside each engine.
    """

    def __init__(self, engines: List["PyTaintEngine"]):
        self.engines = engines

    def walk(self, node: ast.AST) -> None:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for e in self.engines:
                e.local_fns[node.name] = node
                e.scopes.append({})
                e.consts.append({})
                for arg in node.args.args:
                    if any(p in arg.arg.lower() for p in PII_NAMES):
                        e.taint(
                            arg.arg,
                            {
                                "source": f"Sensitive parameter: {arg.arg}",
                                "trace": [f"Sensitive data in parameter {arg.arg} at line {node.lineno}"],
                            },
                        )
            self._children(node)
            for e in self.engines:
                e.consts.pop()
                e.scopes.pop()
            return
        if isinstance(node, ast.Assign):
            if node.targets:
                path = _attr_path(node.targets[0])
                if path:
                    for e in self.engines:
                        e._assign(path, node.value, node.lineno)
            self._children(node)
            return
        if isinstance(node, ast.Call):
            for e in self.engines:
                e._handle_call_node(node)
            self._children(node)
            return
        self._children(node)

    def _children(self, node: ast.AST) -> None:
        for child in ast.iter_child_nodes(node):
            self.walk(child)


PLUGIN_NAME = "Python AST Analyzer"  # part of finding identity


def analyze_python(
    content: str,
    taint_specs: List[TaintSpec],
    fn_index: Optional[Any] = None,
    raise_parse_errors: bool = False,
    tree: Optional[ast.AST] = None,
) -> List[Dict[str, Any]]:
    """All Python-tier findings for one file: structural pass, then ALL
    eligible category engines driven through one parse + one walk
    (parse-once + walk-once fusion of the reference's per-category
    re-parse/re-walk, SURVEY.md §4 R6).

    raise_parse_errors=True raises detectors.ParseFailed on an unparseable
    file instead of the reference-faithful silent [] — the analyze stage
    uses it to surface parse loss as an observable tier-error metric.

    tree: pre-parsed AST of ``content`` (the analyze stage shares one parse
    between this tier and the pattern tier)."""
    if tree is None:
        try:
            tree = ast.parse(content)
        except (SyntaxError, ValueError, RecursionError, MemoryError) as e:
            if raise_parse_errors:
                from . import ParseFailed

                raise ParseFailed(f"python parse failed: {type(e).__name__}: {e}") from e
            return []

    findings: List[Dict[str, Any]] = []
    for s in find_django_mass_assignment(tree):
        findings.append(
            {
                "vuln_type": s["vuln_type"],
                "message": s["message"],
                "severity": "HIGH",
                "line": s["line"],
                "plugin": PLUGIN_NAME,
                "trace": [],
                "rule_id": None,
                "variable": "structural",
                "sink": None,
                "source": None,
                "base_type": s["vuln_type"],
            }
        )

    engines = [PyTaintEngine(spec, fn_index=fn_index) for spec in taint_specs]
    try:
        _MultiWalk(engines).walk(tree)
    except RecursionError:
        # Reference parity for pathologically deep ASTs (plugin.py:41-67
        # wraps per-category visits in one try: a RecursionError keeps all
        # FULLY completed earlier categories and drops the failing one and
        # everything after). The fused walk can't reproduce that boundary —
        # every engine is mid-flight — so fall back to per-engine walks in
        # spec order. The single walks also carry slightly less stack per
        # node than the fused dispatch, so they often complete outright
        # where the fused walk overflowed.
        done = []
        for spec in taint_specs:
            eng = PyTaintEngine(spec, fn_index=fn_index)
            try:
                _MultiWalk([eng]).walk(tree)
            except RecursionError:
                break
            done.append(eng)
        engines = done
    for engine in engines:
        spec = engine.spec
        for hit in engine.hits:
            findings.append(
                {
                    "vuln_type": f"{spec.vuln_type} (AST Taint)",
                    "message": f"Taint flow from source to sink '{hit['sink']}' via variable '{hit['variable']}'",
                    "severity": "HIGH",  # reference python/plugin.py:64 hardcodes HIGH
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
