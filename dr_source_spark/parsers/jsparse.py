"""Minimal structural JavaScript parser (node vocabulary of the reference JS
taint visitor: plugins/javascript/taint_visitor.py:108-152 — function
declarations, arrow functions, variable declarators, assignments incl.
property-assignment targets, call expressions, member chains, binaries,
templates). Tolerant by construction."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .cexpr import ExprParser, Node
from .ctok import TokStream, tokenize

_CTRL_PAREN = {"if", "while", "for", "switch", "catch"}
_CTRL_BARE = {"else", "try", "finally", "do"}


def parse_js(src: str) -> Node:
    ts = TokStream(tokenize(src, js=True))
    stmts: List[Node] = []
    while ts.peek() is not None:
        s = _statement(ts)
        if s is not None:
            stmts.append(s)
    return {"t": "program", "stmts": stmts, "line": 1}


def parse_block(ts: TokStream) -> Node:
    open_tok = ts.peek()
    line = open_tok.line if open_tok else 0
    ts.eat("{")
    stmts: List[Node] = []
    while ts.peek() is not None and not ts.at("}"):
        s = _statement(ts)
        if s is not None:
            stmts.append(s)
    ts.eat("}")
    return {"t": "block", "stmts": stmts, "line": line}


def _expr_parser(ts: TokStream) -> ExprParser:
    return ExprParser(ts, js=True, parse_block=parse_block)


def _statement(ts: TokStream) -> Optional[Node]:
    t = ts.peek()
    if t is None:
        return None
    if t.text == ";":
        ts.next()
        return None
    if t.text == "{":
        return parse_block(ts)
    if t.kind == "id":
        if t.text == "function":
            return _function_decl(ts)
        if t.text in ("const", "let", "var"):
            return _var_decl(ts)
        if t.text in _CTRL_PAREN:
            kw = ts.next()
            conds: List[Node] = []
            if ts.at("("):
                ts.next()
                ep = _expr_parser(ts)
                while ts.peek() is not None and not ts.at(")"):
                    e = ep.expression()
                    if e is not None:
                        conds.append(e)
                    if not (ts.eat(";") or ts.eat(",")):
                        break
                ts.eat(")")
            body = _statement(ts)
            return {"t": "ctrl", "kw": kw.text, "cond": conds, "body": body, "line": kw.line}
        if t.text in _CTRL_BARE:
            kw = ts.next()
            body = _statement(ts)
            return {"t": "ctrl", "kw": kw.text, "cond": [], "body": body, "line": kw.line}
        if t.text in ("return", "throw"):
            kw = ts.next()
            e = None
            if not ts.at(";") and not ts.at("}"):
                e = _expr_parser(ts).expression()
            ts.eat(";")
            return {"t": "ret", "e": e, "line": kw.line}
        if t.text in ("break", "continue"):
            ts.skip_until(";")
            return None
        if t.text in ("import", "export"):
            # export function f() {...} / export default ... — keep the decl
            ts.next()
            if ts.at("default"):
                ts.next()
            if ts.at_kind("id") and ts.peek().text == "function":
                return _function_decl(ts)
            ts.skip_until(";", "}")
            return None
        if t.text == "class":
            return _class_decl(ts)
    save = ts.i
    e = _expr_parser(ts).expression()
    if not ts.eat(";"):
        pass  # ASI tolerance
    if e is None:
        # progress guarantee: a stray token the expression parser refuses
        # to consume (e.g. an unmatched ')') must not loop the statement
        # reader forever
        if ts.i == save and ts.peek() is not None:
            ts.next()  # parse_block never calls _statement at '}', so this
            # only ever eats genuinely stray tokens
        return None
    return {"t": "exprstmt", "e": e, "line": e["line"]}


def _function_decl(ts: TokStream) -> Optional[Node]:
    kw = ts.next()  # function
    name = ts.next().text if ts.at_kind("id") else None
    params: List[str] = []
    if ts.at("("):
        ts.next()
        while ts.peek() is not None and not ts.at(")"):
            tok = ts.next()
            if tok.kind == "id":
                params.append(tok.text)
        ts.next()
    body = parse_block(ts) if ts.at("{") else {"t": "block", "stmts": [], "line": kw.line}
    return {"t": "func", "name": name, "params": params, "body": body, "line": kw.line}


def _var_decl(ts: TokStream) -> Node:
    kw = ts.next()  # const/let/var
    decls: List[Node] = []
    while True:
        t = ts.peek()
        if t is None:
            break
        if t.text in ("{", "["):  # destructuring — names opaque (reference
            # _get_full_path on object_pattern → None, assignment skipped)
            close = "}" if t.text == "{" else "]"
            ts.skip_balanced(t.text, close)
            name = None
            line = t.line
        elif t.kind == "id":
            ts.next()
            name = t.text
            line = t.line
        else:
            break
        value = None
        if ts.eat("="):
            value = _expr_parser(ts).expression()
        decls.append({"t": "vardecl", "name": name, "value": value, "line": line})
        if not ts.eat(","):
            break
    ts.eat(";")
    if len(decls) == 1:
        return decls[0]
    return {"t": "declgroup", "decls": decls, "line": kw.line}


def _class_decl(ts: TokStream) -> Optional[Node]:
    kw = ts.next()
    if ts.at_kind("id"):
        ts.next()
    while ts.peek() is not None and not ts.at("{"):
        ts.next()
    methods: List[Node] = []
    if ts.at("{"):
        ts.next()
        while ts.peek() is not None and not ts.at("}"):
            t = ts.peek()
            if t.kind == "id" and ts.at("(", 1):
                name = ts.next().text
                params: List[str] = []
                ts.next()
                while ts.peek() is not None and not ts.at(")"):
                    tok = ts.next()
                    if tok.kind == "id":
                        params.append(tok.text)
                ts.next()
                body = parse_block(ts) if ts.at("{") else {"t": "block", "stmts": [], "line": t.line}
                methods.append({"t": "func", "name": name, "params": params, "body": body, "line": t.line})
            else:
                ts.next()
        ts.eat("}")
    return {"t": "classjs", "methods": methods, "line": kw.line}


def extract_function_defs(content: str) -> List[Dict[str, Any]]:
    """All function declarations for the symbol index (reference
    javascript/plugin.py:37-61 walks every function_declaration)."""
    try:
        program = parse_js(content)
    except (RecursionError, MemoryError):
        return []
    lines = content.split("\n")
    out: List[Dict[str, Any]] = []

    def snippet(line: int) -> str:
        start = max(0, line - 1)
        depth = 0
        opened = False
        for j in range(start, len(lines)):
            depth += lines[j].count("{") - lines[j].count("}")
            if "{" in lines[j]:
                opened = True
            if opened and depth <= 0:
                return "\n".join(lines[start : j + 1])
        return "\n".join(lines[start:])

    def walk(node: Any) -> None:
        if isinstance(node, dict):
            if node.get("t") in ("func",) and node.get("name"):
                out.append(
                    {"name": node["name"], "def_source": snippet(node["line"]), "def_line": node["line"], "params": node["params"]}
                )
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(program)
    return out
