"""Java intra-file taint analysis over the structural parser's nodes.

Reimplements the reference Java tier's semantics (plugins/java/
taint_visitor.py, taint_detector.py, frameworks.py, plugin.py):

* sources reduced to their last dotted segment (taint_visitor.py:31);
* servlet getters (getParameter/getHeader/getCookies/getQueryString) are
  sources for EVERY category pass (frameworks.py:72, wired at
  taint_visitor.py:107-108);
* PII-substring variable/parameter names self-taint (taint_visitor.py:34,
  92-97,133-137);
* sink match: exact method name, else any KB sink `X.name` by suffix
  (taint_visitor.py:158-163); only method invocations are sinks —
  constructor calls (`new File(x)`) never match, faithfully;
* framework sinks (Spring jdbcTemplate.update, Jakarta getWriter/
  getOutputStream, Hibernate createQuery...) fire when KB sinks don't,
  labeled `{TYPE} ({MapperName})`, during every category pass;
* constants fold across `+` of two literal/constant operands
  (taint_visitor.py:73-83) and suppress taint;
* local AND project-index callees are simulated to depth 3 with
  `Passed to f() in <file> at line N` trace hops (taint_visitor.py:179-186,
  225-248) — callee-file line numbers, caller-file attribution;
* category severity (upper, default MEDIUM), message
  `Sink method '{sink}' called with tainted variable '{var}'`
  (taint_detector.py:33-44).

Category eligibility (sources AND sinks) is applied at KB compile time.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

from ..kb.compile import TaintSpec
from ..parsers.javaparse import parse_java

PII_NAMES = ("password", "email", "secret", "token", "credit_card", "cc", "ssn")
SERVLET_SOURCES = ("getParameter", "getHeader", "getCookies", "getQueryString")
SPRING_ANNOTATIONS = {"RequestParam", "PathVariable", "RequestBody", "RequestHeader", "CookieValue", "ModelAttribute"}
JAXRS_ANNOTATIONS = {"QueryParam", "PathParam", "HeaderParam", "CookieParam", "FormParam", "MatrixParam", "Context"}
SPRING_SINKS = {
    "jdbcTemplate.query": ("SQL_INJECTION", [0]),
    "jdbcTemplate.update": ("SQL_INJECTION", [0]),
    "jdbcTemplate.execute": ("SQL_INJECTION", [0]),
}
JAKARTA_SINKS = {"getWriter": ("XSS", None), "getOutputStream": ("XSS", None)}
HIBERNATE_SINKS = {
    "createQuery": ("SQL_INJECTION", [0]),
    "createNativeQuery": ("SQL_INJECTION", [0]),
    "createSelectionQuery": ("SQL_INJECTION", [0]),
    "createMutationQuery": ("SQL_INJECTION", [0]),
}

MAX_CALL_DEPTH = 3

# Remote-callee parse memo: with fused walks, every category engine on every
# calling file re-simulates the same indexed def_source — the parse is pure,
# so one parse per executor process suffices. Bounded against adversarial
# index churn.
_CALLEE_MEMO: Dict[str, Any] = {}
_CALLEE_MEMO_CAP = 2048


def _parse_callee(wrapped: str):
    hit = _CALLEE_MEMO.get(wrapped, False)
    if hit is not False:
        return hit
    try:
        program = parse_java(wrapped)
    except (RecursionError, MemoryError):
        program = None
    if len(_CALLEE_MEMO) >= _CALLEE_MEMO_CAP:
        _CALLEE_MEMO.clear()
    _CALLEE_MEMO[wrapped] = program
    return program


def _path(node: Optional[Dict]) -> Optional[str]:
    """Dotted path for name / field-access chains (None for anything else)."""
    if node is None:
        return None
    if node["t"] == "name":
        return node["id"]
    if node["t"] == "member":
        base = _path(node["obj"])
        return f"{base}.{node['prop']}" if base else None
    return None


def _idents(node: Optional[Dict], out: Optional[List[str]] = None) -> List[str]:
    """Document-order identifier paths under a node (path at each node plus
    member components, mirroring the reference's child-identifier walk)."""
    if out is None:
        out = []
    if node is None or not isinstance(node, dict):
        return out
    p = _path(node)
    if p is not None and p not in out:
        out.append(p)
    t = node["t"]
    if t == "member":
        _idents(node["obj"], out)
        if node["prop"] not in out:
            out.append(node["prop"])
    elif t == "call":
        callee = node["callee"]
        if callee["t"] == "member":
            _idents(callee["obj"], out)
            if callee["prop"] not in out:
                out.append(callee["prop"])
        else:
            _idents(callee, out)
        for a in node["args"]:
            _idents(a, out)
    elif t == "binary":
        _idents(node["l"], out)
        _idents(node["r"], out)
    elif t == "unary":
        _idents(node["e"], out)
    elif t == "new":
        _idents(node["ctor"], out)
        for a in node["args"]:
            _idents(a, out)
    elif t == "index":
        _idents(node["obj"], out)
        _idents(node["idx"], out)
    elif t == "ternary":
        _idents(node["c"], out)
        _idents(node["a"], out)
        _idents(node["b"], out)
    elif t == "switchexpr":
        _idents(node["subject"], out)
        for arm in node["arms"]:
            _idents(arm, out)
    elif t == "assign":
        _idents(node["target"], out)
        _idents(node["value"], out)
    elif t == "template":
        for part in node["parts"]:
            _idents(part, out)
    return out


def _call_method_name(call: Dict) -> str:
    callee = call["callee"]
    if callee["t"] == "member":
        return callee["prop"]
    if callee["t"] == "name":
        return callee["id"]
    return ""


def _call_receiver_text(call: Dict) -> Optional[str]:
    callee = call["callee"]
    if callee["t"] == "member":
        return _path(callee["obj"])
    return None


class JavaTaintEngine:
    def __init__(
        self,
        spec: TaintSpec,
        fn_index: Optional[Dict[str, Any]] = None,
        depth: int = 0,
        seed_scope: Optional[Dict[str, Dict]] = None,
    ):
        self.spec = spec
        self.sources = {s.split(".")[-1] for s in spec.sources}
        self.sanitizers = {s.split(".")[-1] for s in spec.sanitizers}
        self.sink_args: Dict[str, Optional[List[int]]] = {n: a for n, a in spec.sinks}
        self.fn_index = fn_index
        self.depth = depth
        self.scopes: List[Dict[str, Dict]] = [seed_scope if seed_scope is not None else {}]
        self.consts: List[Dict[str, Any]] = [{}]
        self.hits: List[Dict[str, Any]] = []
        self.functions: Dict[str, Dict] = {}
        self.skip_first_scope = seed_scope is not None
        self.lambda_bodies = False  # set by analyze_java(taint_through_lambdas=True)

    # -- state ----------------------------------------------------------------

    def lookup_taint(self, path: str) -> Optional[Dict]:
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

    def taint(self, path: str, info: Dict) -> None:
        self.scopes[-1][path] = info
        self.consts[-1].pop(path, None)

    def untaint(self, path: str) -> None:
        self.scopes[-1].pop(path, None)

    # -- classification ---------------------------------------------------------

    def _const_value(self, node: Optional[Dict]) -> Any:
        if node is None:
            return None
        if node["t"] == "lit" and node["kind"] in ("str", "num"):
            return node["val"]
        p = _path(node)
        if p:
            return self.lookup_const(p)
        if node["t"] == "binary":
            left, right = self._const_value(node["l"]), self._const_value(node["r"])
            if isinstance(left, str) and isinstance(right, str):
                return left + right
        return None

    def _classify(self, node: Dict, var_name: Optional[str] = None):
        if var_name:
            tail = var_name.lower().split(".")[-1]
            if any(p in tail for p in PII_NAMES):
                return "source", f"Sensitive variable name: {var_name}"
        name = ""
        if node["t"] == "call":
            name = _call_method_name(node)
        else:
            p = _path(node)
            if p:
                name = p
        if not name:
            return None, None
        if name in self.sanitizers:
            return "sanitizer", name
        if name in self.sources:
            return "source", name
        if name in SERVLET_SOURCES:
            return "source", name
        return None, None

    # -- per-node state transitions (traversal lives in _Walker) ---------------

    def _push_scope(self) -> bool:
        if self.skip_first_scope:
            self.skip_first_scope = False
            return False
        self.scopes.append({})
        self.consts.append({})
        return True

    def _pop_scope(self, pushed: bool) -> None:
        if pushed:
            self.consts.pop()
            self.scopes.pop()

    def _enter_param(self, p: Dict) -> None:
        if any(x in p["name"].lower() for x in PII_NAMES):
            self.taint(
                p["name"],
                {"source": f"Sensitive parameter: {p['name']}",
                 "trace": [f"Sensitive data in parameter {p['name']} at line {p['line']}"]},
            )
        for ann in p.get("annotations", []):
            tail = ann.split(".")[-1]
            mapper = "SpringBootMapper" if tail in SPRING_ANNOTATIONS else (
                "JaxRsMapper" if tail in JAXRS_ANNOTATIONS else None
            )
            if mapper:
                self.taint(
                    p["name"],
                    {"source": "Framework", "trace": [f"Tainted by {mapper} at line {p['line']}"]},
                )

    def _assign(self, path: str, value: Dict, line: int) -> None:
        kind, name = self._classify(value, var_name=path)
        if kind == "sanitizer":
            self.untaint(path)
            return
        if kind == "source":
            self.taint(path, {"source": name, "trace": [f"Tainted by {name} at line {line}"]})
            return
        const_val = self._const_value(value)
        if const_val is not None:
            self.consts[-1][path] = const_val
            self.untaint(path)
            return
        for ident in _idents(value):
            info = self.lookup_taint(ident)
            if info:
                self.taint(path, {"source": info["source"], "trace": info["trace"] + [f"Propagated to {path} at line {line}"]})
                return
        self.untaint(path)

    def _handle_call(self, call: Dict) -> None:
        method = _call_method_name(call)
        if not method:
            return
        match_name = None
        if method in self.sink_args:
            match_name = method
        else:
            for s_name in self.sink_args:
                if s_name.endswith("." + method) or s_name == method:
                    match_name = s_name
                    break
        if match_name:
            self._sink_violation(call["args"], match_name, self.sink_args[match_name], call["line"])
            return
        fw = self._framework_sink(call, method)
        if fw:
            v_type, vuln_args, mapper = fw
            label = f"{v_type} ({mapper})"
            self._sink_violation(call["args"], label, vuln_args, call["line"])
            return
        func = self.functions.get(method)
        if func is None and self.fn_index is not None and self.depth < MAX_CALL_DEPTH:
            entry = self.fn_index.get(method)
            if entry and entry.get("lang") == "java":
                self._simulate_remote(call, entry, method)
        elif func is not None:
            self._simulate_local(call, func, method)

    def _framework_sink(self, call: Dict, method: str):
        recv = _call_receiver_text(call)
        full = f"{recv}.{method}" if recv else None
        if full in SPRING_SINKS:
            v, a = SPRING_SINKS[full]
            return v, a, "SpringBootMapper"
        if method in SPRING_SINKS:
            v, a = SPRING_SINKS[method]
            return v, a, "SpringBootMapper"
        if method in JAKARTA_SINKS:
            v, a = JAKARTA_SINKS[method]
            return v, a, "JakartaEEMapper"
        if method in HIBERNATE_SINKS:
            v, a = HIBERNATE_SINKS[method]
            return v, a, "HibernateMapper"
        return None

    def _sink_violation(self, args: List[Dict], sink_name: str, vuln_args: Optional[List[int]], line: int) -> None:
        for idx, arg in enumerate(args):
            if vuln_args is not None and idx not in vuln_args:
                continue
            for path in _idents(arg):
                info = self.lookup_taint(path)
                if info:
                    self.hits.append({"sink": sink_name, "variable": path, "line": line, "trace": info["trace"]})
                    break

    def _bind_args(self, call: Dict, params: List[str], loc: str) -> Dict[str, Dict]:
        seeded: Dict[str, Dict] = {}
        for idx, arg in enumerate(call["args"]):
            if idx >= len(params):
                break
            for path in _idents(arg):
                info = self.lookup_taint(path)
                if info:
                    seeded[params[idx]] = {
                        "source": info["source"],
                        "trace": info["trace"] + [f"Passed to {_call_method_name(call)}() {loc} at line {call['line']}"],
                    }
                    break
        return seeded

    def _simulate_local(self, call: Dict, func: Dict, method: str) -> None:
        if self.depth >= MAX_CALL_DEPTH:
            return
        seeded = self._bind_args(call, [p["name"] for p in func["params"]], "locally")
        if seeded:
            # NB: the sub-engine starts with an empty local-function registry
            # (reference _simulate_call builds a fresh visitor,
            # taint_visitor.py:247) — transitive local chains do not resolve,
            # only project-index callees do.
            sub = JavaTaintEngine(self.spec, self.fn_index, self.depth + 1, seed_scope=seeded)
            sub.lambda_bodies = self.lambda_bodies
            _Walker([sub], lambda_bodies=self.lambda_bodies).visit_block(func["body"])
            self.hits.extend(sub.hits)

    def _simulate_remote(self, call: Dict, entry: Dict[str, Any], method: str) -> None:
        # pad so the re-parsed snippet reports lines ABSOLUTE in the defining
        # file (reference keeps the original tree-sitter node, java/plugin.py:63)
        pad = "\n" * max(0, int(entry.get("def_line", 1)) - 1)
        wrapped = "class __W {" + pad + (entry.get("def_source") or "") + "\n}"
        program = _parse_callee(wrapped)
        if program is None:
            return
        methods = [m for c in program["classes"] for m in c["methods"] if m["name"] == method]
        if not methods:
            return
        func = methods[0]
        loc = f"in {os.path.basename(entry['path'])}"
        seeded = self._bind_args(call, [p["name"] for p in func["params"]], loc)
        if seeded:
            sub = JavaTaintEngine(self.spec, self.fn_index, self.depth + 1, seed_scope=seeded)
            sub.lambda_bodies = self.lambda_bodies
            _Walker([sub], lambda_bodies=self.lambda_bodies).visit_block(func["body"])
            self.hits.extend(sub.hits)


class _Walker:
    """ONE traversal of the parsed program driving N per-category engines in
    lockstep (the fusion the Python tier already does with _MultiWalk): the
    AST is visited once per FILE instead of once per category. Each engine
    keeps its own scope/taint/const state; the walker only owns structure.
    Semantics-preserving because engines never interact and the reference
    walks each category over the identical node sequence."""

    def __init__(self, engines: List["JavaTaintEngine"], lambda_bodies: bool = False):
        self.engines = engines
        # lambda_bodies=True walks arrow-expression bodies as nested scopes
        # (captured locals stay visible via the scope stack). Off by default:
        # the engine-snapshot goldens were pinned with lambdas opaque
        # (docs/FUTURE.md), so parity mode must not grow findings.
        self.lambda_bodies = lambda_bodies

    def run(self, program: Dict) -> None:
        for cls in program.get("classes", []):
            self.visit_class(cls)

    def _push(self) -> List[bool]:
        return [e._push_scope() for e in self.engines]

    def _pop(self, pushed: List[bool]) -> None:
        for e, p in zip(self.engines, pushed):
            e._pop_scope(p)

    def visit_class(self, cls: Dict) -> None:
        # pre-register methods (reference taint_visitor.py:120-126): calls
        # textually before a method's definition still resolve.
        for m in cls.get("methods", []):
            for e in self.engines:
                e.functions[m["name"]] = m
        members = sorted(
            cls.get("fields", []) + cls.get("methods", []) + cls.get("inner", []),
            key=lambda n: n.get("line", 0),
        )
        for member in members:
            if member["t"] == "method":
                self.visit_method(member)
            elif member["t"] == "class":
                self.visit_class(member)
            else:
                self.visit_stmt(member)

    def visit_method(self, m: Dict) -> None:
        pushed = self._push()
        for p in m["params"]:
            for e in self.engines:
                e._enter_param(p)
        self.visit_block(m["body"])
        self._pop(pushed)

    def visit_block(self, block: Dict) -> None:
        pushed = self._push()
        for s in block.get("stmts", []):
            self.visit_stmt(s)
        self._pop(pushed)

    def visit_stmt(self, s: Optional[Dict]) -> None:
        if s is None:
            return
        t = s["t"]
        if t == "block":
            self.visit_block(s)
        elif t == "vardecl":
            if s.get("value") is not None:
                for e in self.engines:
                    e._assign(s["name"], s["value"], s["line"])
                self.visit_expr(s["value"])
        elif t == "declgroup":
            for d in s["decls"]:
                self.visit_stmt(d)
        elif t == "ctrl":
            for c in s.get("cond", []):
                self.visit_expr(c)
            self.visit_stmt(s.get("body"))
        elif t == "ret":
            self.visit_expr(s.get("e"))
        elif t == "exprstmt":
            self.visit_expr(s.get("e"))
        elif t == "method":
            self.visit_method(s)

    def visit_expr(self, e: Optional[Dict]) -> None:
        if e is None or not isinstance(e, dict):
            return
        t = e["t"]
        if t == "assign":
            p = _path(e["target"])
            if p and e.get("value") is not None:
                for eng in self.engines:
                    eng._assign(p, e["value"], e["line"])
            self.visit_expr(e["target"])
            self.visit_expr(e.get("value"))
        elif t == "call":
            for eng in self.engines:
                eng._handle_call(e)
            self.visit_expr(e["callee"]["obj"] if e["callee"]["t"] == "member" else e["callee"])
            for a in e["args"]:
                self.visit_expr(a)
        elif t == "binary":
            self.visit_expr(e["l"])
            self.visit_expr(e["r"])
        elif t == "unary":
            self.visit_expr(e["e"])
        elif t == "new":
            for a in e["args"]:
                self.visit_expr(a)
        elif t == "index":
            self.visit_expr(e["obj"])
            self.visit_expr(e["idx"])
        elif t == "ternary":
            self.visit_expr(e["c"])
            self.visit_expr(e["a"])
            self.visit_expr(e["b"])
        elif t == "switchexpr":
            self.visit_expr(e["subject"])
            for arm in e["arms"]:
                self.visit_expr(arm)
        elif t == "template":
            for part in e["parts"]:
                self.visit_expr(part)
        elif t == "arrow" and self.lambda_bodies:
            pushed = self._push()
            for name in e.get("params", []):
                for eng in self.engines:
                    eng._enter_param({"name": name, "annotations": [], "line": e["line"]})
            self.visit_block(e.get("body") or {"t": "block", "stmts": [], "line": e["line"]})
            self._pop(pushed)


PLUGIN_NAME = "Java AST Analyzer (Tree-sitter)"  # reference plugin display name


def analyze_java(
    content: str,
    taint_specs: List[TaintSpec],
    fn_index: Optional[Dict[str, Any]] = None,
    taint_through_lambdas: bool = False,
) -> List[Dict[str, Any]]:
    """All Java AST-tier findings for one file: parse once, ONE fused walk
    driving all eligible category engines (reference re-parses AND re-walks
    per category; fusion is semantics-preserving, SURVEY.md §4 R6).

    taint_through_lambdas=True additionally walks arrow-expression bodies
    (captured locals visible; lambda params enter scope) — an EXTENSION over
    the pinned parity behavior, where lambda bodies are opaque. Default off
    so goldens/oracles are byte-identical."""
    if not taint_specs:
        # all categories screened out (or none eligible): no engine could
        # emit a hit, so skip the parse AND the walk entirely
        return []
    try:
        program = parse_java(content)
    except (RecursionError, MemoryError):
        return []
    engines = [JavaTaintEngine(spec, fn_index=fn_index) for spec in taint_specs]
    for e in engines:
        e.lambda_bodies = taint_through_lambdas
    try:
        _Walker(engines, lambda_bodies=taint_through_lambdas).run(program)
    except RecursionError:
        engines = []
    findings: List[Dict[str, Any]] = []
    for engine in engines:
        spec = engine.spec
        for hit in engine.hits:
            findings.append(
                {
                    "vuln_type": f"{spec.vuln_type} (AST Taint)",
                    "message": f"Sink method '{hit['sink']}' called with tainted variable '{hit['variable']}'",
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
