"""Minimal structural Java parser.

Covers the node vocabulary the reference Java taint visitor consumes
(reference plugins/java/taint_visitor.py:118-190): classes, methods with
annotated formal parameters, blocks, local/field variable declarators,
assignments, method invocations, field-access chains, binary string
concatenation, literals. Control statements (if/for/while/try/...) are
parsed as condition-expressions + nested blocks so taint flows through them;
anything else degrades to skipped tokens, never an exception.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from .cexpr import ExprParser, Node
from .ctok import Tok, TokStream, tokenize

_MODIFIERS = {
    "public", "private", "protected", "static", "final", "abstract",
    "synchronized", "native", "transient", "volatile", "strictfp", "default",
}
_CTRL_PAREN = {"if", "while", "for", "switch", "catch", "synchronized"}
_CTRL_BARE = {"else", "try", "finally", "do"}


def parse_java(src: str) -> Node:
    ts = TokStream(tokenize(src))
    program: Node = {"t": "program", "classes": [], "line": 1}
    while ts.peek() is not None:
        t = ts.peek()
        if t.kind == "id" and t.text in ("package", "import"):
            ts.skip_until(";")
            continue
        anns = _annotations(ts)
        _skip_modifiers(ts)
        t = ts.peek()
        if t is not None and t.kind == "id" and t.text in ("class", "interface", "enum", "record"):
            cls = _class_decl(ts)
            if cls is not None:
                cls["annotations"] = anns
                program["classes"].append(cls)
            continue
        ts.next()
    return program


def _annotations(ts: TokStream) -> List[str]:
    anns = []
    while ts.at_kind("id") and ts.peek().text.startswith("@"):
        anns.append(ts.next().text[1:])
        if ts.at("("):
            ts.skip_balanced("(", ")")
    return anns


def _skip_modifiers(ts: TokStream) -> None:
    while ts.at_kind("id") and ts.peek().text in _MODIFIERS:
        ts.next()


def _skip_generics(ts: TokStream) -> None:
    """Skip a balanced `<...>` from an opening '<'. The tokenizer emits
    composite shift tokens, so nested closers arrive as '>>'/'>>>' — count
    every token by how many angle brackets it contributes."""
    depth = 0
    while ts.peek() is not None:
        txt = ts.next().text
        if "<" in txt and set(txt) <= set("<="):
            depth += txt.count("<")
        elif ">" in txt and set(txt) <= set(">="):
            depth -= txt.count(">")
            if depth <= 0:
                return


def _skip_type(ts: TokStream) -> None:
    """Consume a type: Name(.Name)*(<...>)?([])*"""
    if not ts.at_kind("id"):
        return
    ts.next()
    while True:
        if ts.at("."):
            ts.next()
            if ts.at_kind("id"):
                ts.next()
            continue
        if ts.at("<"):
            _skip_generics(ts)
            continue
        if ts.at("[") and ts.at("]", 1):
            ts.next()
            ts.next()
            continue
        break


def _class_decl(ts: TokStream) -> Optional[Node]:
    kw = ts.next()  # class/interface/...
    name = ts.next().text if ts.at_kind("id") else "?"
    while ts.peek() is not None and not ts.at("{"):
        ts.next()  # extends/implements clause
    if not ts.at("{"):
        return None
    ts.next()
    cls: Node = {"t": "class", "name": name, "methods": [], "fields": [], "inner": [], "line": kw.line}
    while ts.peek() is not None and not ts.at("}"):
        member = _member(ts)
        if member is None:
            continue
        if member["t"] == "method":
            cls["methods"].append(member)
        elif member["t"] == "class":
            cls["inner"].append(member)
        else:
            cls["fields"].append(member)
    ts.eat("}")
    return cls


def _member(ts: TokStream) -> Optional[Node]:
    anns = _annotations(ts)
    _skip_modifiers(ts)
    t = ts.peek()
    if t is None:
        return None
    if t.text in ("class", "interface", "enum", "record"):
        inner = _class_decl(ts)
        if inner is not None:
            inner["annotations"] = anns
        return inner
    if t.text == ";":
        ts.next()
        return None
    if t.text == "{":  # initializer block
        ts.skip_balanced("{", "}")
        return None
    if t.text == "<":  # generic method type params (nested bounds emit
        # composite '>>' tokens — skip_balanced can't count those)
        _skip_generics(ts)
        _skip_modifiers(ts)
    # method: [Type] name ( ... )  — constructor has no return type
    save = ts.i
    _skip_type(ts)
    if ts.at_kind("id") and ts.at("(", 1):
        name_tok = ts.next()
        return _method_rest(ts, name_tok, anns)
    ts.i = save
    if ts.at_kind("id") and ts.at("(", 1):  # constructor
        name_tok = ts.next()
        return _method_rest(ts, name_tok, anns, ctor=True)
    # field declaration: Type name [= expr] (, name [= expr])* ;
    ts.i = save
    return _field(ts)


def _method_rest(ts: TokStream, name_tok: Tok, anns: List[str], ctor: bool = False) -> Optional[Node]:
    params = _params(ts)
    while ts.peek() is not None and not ts.at("{") and not ts.at(";"):
        ts.next()  # throws clause
    if ts.eat(";"):
        body: Node = {"t": "block", "stmts": [], "line": name_tok.line}
    elif ts.at("{"):
        body = parse_block(ts)
    else:
        return None
    return {
        "t": "method",
        "name": name_tok.text,
        "params": params,
        "annotations": anns,
        "body": body,
        "ctor": ctor,
        "line": name_tok.line,
    }


def _params(ts: TokStream) -> List[Dict[str, Any]]:
    """'(' annotated typed params ')' → [{name, annotations, line}]"""
    params: List[Dict[str, Any]] = []
    if not ts.at("("):
        return params
    ts.next()
    while ts.peek() is not None and not ts.at(")"):
        anns = _annotations(ts)
        _skip_modifiers(ts)
        # collect tokens until ',' or ')' at depth 0; param name = last id.
        # Composite shift tokens close several generic angles at once
        # (Tuple2<Integer, Tuple2<Integer, Integer>> p arrives as '>>' —
        # found by the real-code corpus), so count angle contributions per
        # token like _skip_generics does.
        toks: List[Tok] = []
        depth = 0
        while ts.peek() is not None:
            t = ts.peek()
            if depth == 0 and t.text in (",", ")"):
                break
            txt = t.text
            if txt in ("(", "<", "["):
                depth += 1
            elif txt in (")", "]"):
                depth -= 1
            elif txt and set(txt) <= {">"}:
                depth -= len(txt)
            toks.append(ts.next())
        ids = [t for t in toks if t.kind == "id"]
        if ids:
            params.append({"name": ids[-1].text, "annotations": anns, "line": ids[-1].line})
        ts.eat(",")
    ts.eat(")")
    return params


def parse_block(ts: TokStream) -> Node:
    """'{' statements '}' → block node."""
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
        if t.text in _CTRL_PAREN:
            kw = ts.next()
            cond = None
            if ts.at("("):
                ts.next()
                ep = ExprParser(ts, js=False, parse_block=parse_block)
                conds = []
                while ts.peek() is not None and not ts.at(")"):
                    e = ep.expression()
                    if e is not None:
                        conds.append(e)
                    if not (ts.eat(";") or ts.eat(",") or ts.eat(":")):
                        break
                ts.eat(")")
                cond = conds
            body = _statement(ts)
            return {"t": "ctrl", "kw": kw.text, "cond": cond or [], "body": body, "line": kw.line}
        if t.text in _CTRL_BARE:
            kw = ts.next()
            body = _statement(ts)
            return {"t": "ctrl", "kw": kw.text, "cond": [], "body": body, "line": kw.line}
        if t.text in ("return", "throw"):
            kw = ts.next()
            e = None
            if not ts.at(";"):
                e = ExprParser(ts, js=False, parse_block=parse_block).expression()
            ts.eat(";")
            return {"t": "ret", "e": e, "line": kw.line}
        if t.text in ("break", "continue", "case", "default"):
            ts.skip_until(";", ":")
            return None
        # local variable declaration?  Type name = ... ;
        decl = _try_local_decl(ts)
        if decl is not None:
            return decl
    # expression statement
    e = ExprParser(ts, js=False, parse_block=parse_block).expression()
    if not ts.eat(";"):
        # tolerate missing ';' — resync at statement boundary
        while ts.peek() is not None and not ts.at(";") and not ts.at("}") and not ts.at("{"):
            ts.next()
        ts.eat(";")
    if e is None:
        return None
    return {"t": "exprstmt", "e": e, "line": e["line"]}


_TYPE_START = re.compile(r"^[A-Za-z_$]")


def _try_local_decl(ts: TokStream) -> Optional[Node]:
    """Lookahead for `Type name = expr;` / `Type name;` (declarator list)."""
    save = ts.i
    _skip_type(ts)
    if ts.i == save or not ts.at_kind("id"):
        ts.i = save
        return None
    nxt = ts.peek(1)
    if nxt is None or nxt.text not in ("=", ";", ","):
        ts.i = save
        return None
    decls: List[Node] = []
    while True:
        name_tok = ts.next()
        value = None
        if ts.eat("="):
            value = ExprParser(ts, js=False, parse_block=parse_block).expression()
        decls.append({"t": "vardecl", "name": name_tok.text, "value": value, "line": name_tok.line})
        if not ts.eat(","):
            break
        if not ts.at_kind("id"):
            break
    ts.eat(";")
    if len(decls) == 1:
        return decls[0]
    return {"t": "declgroup", "decls": decls, "line": decls[0]["line"]}


def _field(ts: TokStream) -> Optional[Node]:
    decl = _try_local_decl(ts)
    if decl is None:
        ts.skip_until(";", "}")
        return None
    return decl


# -- symbol index extraction (job 1) ----------------------------------------

def extract_method_defs(content: str) -> List[Dict[str, Any]]:
    """All method declarations: name, source snippet, param names
    (reference java/plugin.py:44-71 walks every method_declaration)."""
    out: List[Dict[str, Any]] = []
    try:
        program = parse_java(content)
    except (RecursionError, MemoryError):
        return []
    lines = content.split("\n")

    def snippet(line: int) -> str:
        # best-effort source slice from the decl line to the matching brace
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

    def walk_class(cls: Node) -> None:
        for m in cls.get("methods", []):
            out.append({"name": m["name"], "def_source": snippet(m["line"]), "def_line": m["line"], "params": [p["name"] for p in m["params"]]})
        for inner in cls.get("inner", []):
            walk_class(inner)

    for cls in program["classes"]:
        walk_class(cls)
    return out
