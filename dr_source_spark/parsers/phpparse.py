"""Minimal structural PHP parser (node vocabulary of the reference PHP taint
visitor: plugins/php/taint_visitor.py:109-149 — assignments, function calls,
echo statements, include/require expressions, member/subscript access,
string-concat binaries, function definitions).

Notable parity point: `$obj->method(...)` is produced as node type "mcall"
(tree-sitter's member_call_expression) which the reference visitor does NOT
treat as a sink — only plain function_call_expression names are matched.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

Node = Dict[str, Any]

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*|//[^\n]*|/\*.*?\*/)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<id>[A-Za-z_\\][A-Za-z0-9_\\]*)
  | (?P<p3>===|!==|<=>|\*\*=|\.=)
  | (?P<p2>==|!=|<=|>=|&&|\|\||->|=>|::|\+=|-=|\+\+|--)
  | (?P<p1>[{}()\[\];,=<>+\-*/.!&|^%?:@~])
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokens(src: str) -> List[Tuple[str, str, int]]:
    toks = []
    # incremental line tracking — counting from 0 per token is O(n) per
    # token, quadratic overall (a 327 KB generated file took ~9 s of pure
    # str.count before this; ~0.1 s after). Match starts are monotonic, so
    # counting newlines in the gap since the previous start is exact even
    # across multi-line tokens (block comments, multi-line strings).
    line = 1
    last = 0
    for m in _TOKEN_RE.finditer(src):
        kind = m.lastgroup
        text = m.group()
        start = m.start()
        line += src.count("\n", last, start)
        last = start
        if kind == "comment":
            continue
        toks.append((kind, text, line))
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, off=0):
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def at(self, text, off=0):
        t = self.peek(off)
        return t is not None and t[1] == text

    def eat(self, text):
        if self.at(text):
            self.i += 1
            return True
        return False

    def skip_balanced(self, op, cl):
        depth = 0
        while True:
            t = self.next()
            if t is None:
                return
            if t[1] == op:
                depth += 1
            elif t[1] == cl:
                depth -= 1
                if depth == 0:
                    return


# heredoc/nowdoc opener: <<<TAG, <<<"TAG" (interpolating), <<<'TAG' (nowdoc)
_PHP_HEREDOC_OPEN = re.compile(r"<<<([\"']?)([A-Za-z_][A-Za-z0-9_]*)\1[ \t]*\r?\n")
_HEREDOC_CALL = "__DRS_HEREDOC__"


def _blank_heredocs(src: str) -> str:
    """Replace heredoc/nowdoc literals before tokenizing — their body lines
    would otherwise lex as code (sink-shaped text in a heredoc could
    false-positive, and unbalanced brackets desync statement recovery).

    Reference parity (plugins/php/taint_visitor.py:76,151-167): tree-sitter
    heredoc nodes are NOT constant-resolvable, so `$q = <<<SQL ... $i ...`
    propagates EXISTING taint of the interpolated vars via
    collect_identifiers — unlike a double-quoted "SELECT $i", which
    _resolve_value treats as a constant (clearing taint). We reproduce that
    exact asymmetry by rewriting an interpolating heredoc to a synthetic
    call ``__DRS_HEREDOC__($i, ...)`` (unknown call = propagate-args, not
    constant) and a nowdoc to ``''`` (constant). Newline counts preserved;
    an heredoc with no terminator is left untouched (conservative miss).
    String/comment-aware scan so ``<<<`` inside literals can't trigger."""
    if "<<<" not in src:
        return src
    out: List[str] = []
    i, n = 0, len(src)
    mode: Optional[str] = None  # None | "'" | '"' | "//" | "/*"
    while i < n:
        c = src[i]
        if mode == "//":
            if c == "\n":
                mode = None
            out.append(c)
            i += 1
            continue
        if mode == "/*":
            if c == "*" and i + 1 < n and src[i + 1] == "/":
                out.append("*/")
                i += 2
                mode = None
                continue
            out.append(c)
            i += 1
            continue
        if mode in ("'", '"'):
            if c == "\\" and i + 1 < n:
                out.append(src[i : i + 2])
                i += 2
                continue
            if c == mode:
                mode = None
            out.append(c)
            i += 1
            continue
        if c in ("'", '"'):
            mode = c
            out.append(c)
            i += 1
            continue
        if c == "#" or (c == "/" and i + 1 < n and src[i + 1] == "/"):
            mode = "//"
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            mode = "/*"
            out.append(c)
            i += 1
            continue
        if c == "<":
            m = _PHP_HEREDOC_OPEN.match(src, i)
            if m:
                quote, tag = m.group(1), m.group(2)
                term = re.compile(rf"^[ \t]*{tag}(?![A-Za-z0-9_])", re.M)
                tm = term.search(src, m.end())
                if tm:
                    body = src[m.end() : tm.start()]
                    if quote == "'":
                        repl = "''"
                    else:
                        seen: List[str] = []
                        for v in re.findall(r"\$[A-Za-z_][A-Za-z0-9_]*", body):
                            if v not in seen:
                                seen.append(v)
                        repl = f"{_HEREDOC_CALL}({', '.join(seen)})" if seen else "''"
                    consumed_end = tm.end()
                    nl = src.count("\n", i, consumed_end)
                    out.append(repl + "\n" * nl)
                    i = consumed_end
                    continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_php(src: str) -> Node:
    body = re.sub(r"<\?php|<\?|\?>", lambda m: " " * len(m.group()), src)
    body = _blank_heredocs(body)
    p = _P(_tokens(body))
    stmts = _stmts(p, top=True)
    return {"t": "program", "stmts": stmts, "line": 1}


def _stmts(p: _P, top=False) -> List[Node]:
    out: List[Node] = []
    while True:
        t = p.peek()
        if t is None:
            return out
        if t[1] == "}":
            if top:
                p.next()
                continue
            return out
        s = _stmt(p)
        if s is not None:
            out.append(s)


def _stmt(p: _P) -> Optional[Node]:
    t = p.peek()
    if t is None:
        return None
    kind, text, line = t
    if text == ";":
        p.next()
        return None
    if text == "{":
        p.next()
        inner = _stmts(p)
        p.eat("}")
        return {"t": "block", "stmts": inner, "line": line}
    if kind == "id":
        low = text.lower()
        if low == "function":
            return _function(p)
        if low == "echo" or low == "print":
            p.next()
            args = []
            while p.peek() is not None and not p.at(";"):
                e = _expr(p)
                if e is None:
                    break
                args.append(e)
                if not p.eat(","):
                    break
            p.eat(";")
            return {"t": "echo", "args": args, "line": line}
        if low in ("include", "include_once", "require", "require_once"):
            p.next()
            e = _expr(p)
            p.eat(";")
            return {"t": "include", "kw": low.split("_")[0], "arg": e, "line": line}
        if low in ("if", "while", "for", "foreach", "switch", "elseif", "catch"):
            p.next()
            conds = []
            if p.at("("):
                p.next()
                while p.peek() is not None and not p.at(")"):
                    e = _expr(p)
                    if e is None:
                        p.next()
                        continue
                    conds.append(e)
                    if not (p.eat(";") or p.eat(",") or p.eat("=>")):
                        break
                p.eat(")")
            body = _stmt(p)
            return {"t": "ctrl", "cond": conds, "body": body, "line": line}
        if low in ("else", "try", "finally", "do"):
            p.next()
            body = _stmt(p)
            return {"t": "ctrl", "cond": [], "body": body, "line": line}
        if low in ("return", "throw"):
            p.next()
            e = None
            if not p.at(";"):
                e = _expr(p)
            p.eat(";")
            return {"t": "ret", "e": e, "line": line}
        if low in ("class", "interface", "trait"):
            p.next()
            while p.peek() is not None and not p.at("{"):
                p.next()
            if p.at("{"):
                p.next()
                inner = _stmts(p)
                p.eat("}")
                return {"t": "block", "stmts": inner, "line": line}
            return None
    e = _expr(p)
    if not p.eat(";"):
        if e is None:
            p.next()
            return None
        # resync
        while p.peek() is not None and not p.at(";") and not p.at("}"):
            p.next()
        p.eat(";")
    if e is None:
        return None
    return {"t": "exprstmt", "e": e, "line": e["line"]}


def _function(p: _P) -> Optional[Node]:
    t = p.next()  # function
    name = None
    nt = p.peek()
    if nt is not None and nt[0] == "id":
        name = nt[1]
        p.next()
    params: List[str] = []
    if p.at("("):
        p.next()
        while p.peek() is not None and not p.at(")"):
            tok = p.next()
            if tok[0] == "var":
                params.append(tok[1])
        p.next()
    body: Node = {"t": "block", "stmts": [], "line": t[2]}
    while p.peek() is not None and not p.at("{") and not p.at(";"):
        p.next()
    if p.at("{"):
        p.next()
        body = {"t": "block", "stmts": _stmts(p), "line": t[2]}
        p.eat("}")
    return {"t": "func", "name": name, "params": params, "body": body, "line": t[2]}


_ASSIGN = {"=", ".=", "+=", "-="}
_BIN = [{"||"}, {"&&"}, {"==", "!=", "===", "!==", "<", ">", "<=", ">=", "<=>"}, {".", "+", "-"}, {"*", "/", "%"}]


def _expr(p: _P, level: int = -1) -> Optional[Node]:
    if level == -1:
        left = _expr(p, 0)
        t = p.peek()
        if left is not None and t is not None and t[1] in _ASSIGN:
            op = p.next()[1]
            right = _expr(p, -1)
            if op != "=" and right is not None:
                right = {"t": "binary", "op": op[:-1], "l": left, "r": right, "line": left["line"]}
            return {"t": "assign", "target": left, "value": right, "line": left["line"]}
        if t is not None and t[1] == "?":
            p.next()
            a = _expr(p, -1)
            p.eat(":")
            b = _expr(p, -1)
            return {"t": "ternary", "c": left, "a": a, "b": b, "line": (left or {}).get("line", 0)}
        return left
    if level >= len(_BIN):
        return _postfix(p)
    left = _expr(p, level + 1)
    while True:
        t = p.peek()
        if left is None or t is None or t[1] not in _BIN[level]:
            return left
        p.next()
        right = _expr(p, level + 1)
        if right is None:
            return left
        left = {"t": "binary", "op": t[1], "l": left, "r": right, "line": left["line"]}


def _postfix(p: _P) -> Optional[Node]:
    node = _primary(p)
    if node is None:
        return None
    while True:
        t = p.peek()
        if t is None:
            return node
        if t[1] == "->":
            p.next()
            prop = p.peek()
            if prop is None or prop[0] not in ("id", "var"):
                return node
            p.next()
            if p.at("("):
                args = _args(p)
                node = {"t": "mcall", "obj": node, "name": prop[1], "args": args, "line": node["line"]}
            else:
                node = {"t": "member", "obj": node, "prop": prop[1], "line": node["line"]}
        elif t[1] == "::":
            p.next()
            prop = p.peek()
            if prop is None:
                return node
            p.next()
            if p.at("("):
                args = _args(p)
                node = {"t": "mcall", "obj": node, "name": prop[1], "args": args, "line": node["line"]}
            else:
                node = {"t": "member", "obj": node, "prop": prop[1], "line": node["line"]}
        elif t[1] == "[":
            p.next()
            idx = _expr(p)
            p.eat("]")
            node = {"t": "index", "obj": node, "idx": idx, "line": node["line"]}
        elif t[1] == "(":
            args = _args(p)
            node = {"t": "call", "callee": node, "args": args, "line": node["line"]}
        else:
            return node


def _args(p: _P) -> List[Node]:
    p.next()  # '('
    args: List[Node] = []
    while p.peek() is not None and not p.at(")"):
        e = _expr(p)
        if e is not None:
            args.append(e)
        if not p.eat(","):
            break
    p.eat(")")
    return args


def _primary(p: _P) -> Optional[Node]:
    t = p.peek()
    if t is None:
        return None
    kind, text, line = t
    if kind == "str":
        p.next()
        quote = text[0]
        val = text[1:-1]
        interp = quote == '"' and ("$" in val)
        return {"t": "lit", "kind": "str", "val": val, "interp": interp, "line": line}
    if kind == "num":
        p.next()
        return {"t": "lit", "kind": "num", "val": text, "line": line}
    if kind == "var":
        p.next()
        return {"t": "name", "id": text, "line": line}
    if kind == "id":
        low = text.lower()
        p.next()
        if low == "new":
            ctor = _postfix(p)
            return {"t": "new", "ctor": ctor, "args": (ctor or {}).get("args", []), "line": line}
        if low in ("true", "false", "null", "on", "off"):
            return {"t": "lit", "kind": "bool", "val": text, "line": line}
        if low in ("include", "include_once", "require", "require_once"):
            e = _expr(p)
            return {"t": "includeexpr", "kw": low.split("_")[0], "arg": e, "line": line}
        if low == "match" and p.at("("):
            # PHP 8 match EXPRESSION: subject + every arm condition/result
            # become args of an unknown-call node — the engine then
            # propagates any tainted arm identifier and never
            # constant-folds, which is exactly the reference's
            # collect_identifiers treatment of the tree-sitter
            # match_expression subtree (php/taint_visitor.py:81-86,162)
            p.next()
            subj = _expr(p)
            while p.peek() is not None and not p.at(")"):
                p.next()
            p.eat(")")
            args = [subj] if subj is not None else []
            if p.at("{"):
                p.next()
                depth = 1
                while p.peek() is not None and depth:
                    if p.at("{"):
                        depth += 1
                        p.next()
                        continue
                    if p.at("}"):
                        depth -= 1
                        p.next()
                        continue
                    if p.at(",") or p.at("=>"):
                        p.next()
                        continue
                    tok = p.peek()
                    if tok[0] == "id" and tok[1].lower() == "default":
                        p.next()
                        continue
                    e = _expr(p)
                    if e is None:
                        p.next()
                    else:
                        args.append(e)
            return {"t": "call", "callee": {"t": "name", "id": "match", "line": line}, "args": args, "line": line}
        return {"t": "name", "id": text.lstrip("\\"), "line": line}
    if text == "(":
        p.next()
        e = _expr(p)
        p.eat(")")
        return e
    if text == "[":
        p.next()
        items = []
        while p.peek() is not None and not p.at("]"):
            e = _expr(p)
            if e is not None:
                items.append(e)
            if not p.eat(","):
                break
        p.eat("]")
        return {"t": "arraylit", "items": items, "line": line}
    if text in ("!", "-", "+", "~", "@", "&"):
        p.next()
        e = _expr(p, len(_BIN) - 1)
        return {"t": "unary", "op": text, "e": e, "line": line} if e else None
    p.next()
    return None


# Interpolated variable extraction for double-quoted strings
_INTERP_RE = re.compile(r"\$\{?([A-Za-z_][A-Za-z0-9_]*)\}?(?:->([A-Za-z_][A-Za-z0-9_]*)|\[['\"]?([A-Za-z0-9_]+)['\"]?\])?")


def interp_vars(val: str) -> List[str]:
    out = []
    for m in _INTERP_RE.finditer(val):
        base = "$" + m.group(1)
        if m.group(2):
            out.append(f"{base}->{m.group(2)}")
        elif m.group(3):
            out.append(f"{base}[]")
        else:
            out.append(base)
    return out
