"""Pratt-style expression parser over the shared C-family token stream.

Produces small dict nodes — the exact vocabulary the taint engines consume
(calls, member chains, assignments, binaries, literals; JS adds arrow/
function expressions, templates, object/array literals). Tolerant: anything
unparseable degrades to an opaque node rather than raising.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .ctok import TokStream

Node = Dict[str, Any]

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<=", ">>="}
_BIN_LEVELS = [
    {"||", "??"},
    {"&&"},
    {"|"},
    {"^"},
    {"&"},
    {"==", "!=", "===", "!=="},
    {"<", ">", "<=", ">=", "instanceof", "in"},
    {"<<", ">>", ">>>"},
    {"+", "-"},
    {"*", "/", "%"},
]

_STOP_DEFAULT = {";", ",", ")", "]", "}", ":"}

_BIN_PREC = {op: lvl for lvl, ops in enumerate(_BIN_LEVELS) for op in ops}


class ExprParser:
    def __init__(self, ts: TokStream, js: bool = False, parse_block=None):
        self.ts = ts
        self.js = js
        self.parse_block = parse_block  # callback for js arrow/function bodies

    # -- entry ---------------------------------------------------------------

    def expression(self) -> Optional[Node]:
        return self._assign()

    def _assign(self) -> Optional[Node]:
        left = self._ternary()
        t = self.ts.peek()
        if left is not None and t is not None and t.text in _ASSIGN_OPS and t.kind == "punct":
            op = self.ts.next().text
            right = self._assign()
            if op == "=":
                return {"t": "assign", "target": left, "value": right, "line": left["line"]}
            # compound assignment: model as target = target <op> value (taint-
            # equivalent: RHS identifiers include the target itself)
            synth = {"t": "binary", "op": op[:-1], "l": left, "r": right, "line": left["line"]}
            return {"t": "assign", "target": left, "value": synth, "line": left["line"]}
        return left

    def _ternary(self) -> Optional[Node]:
        cond = self._binary(0)
        if self.ts.at("?") and not self.ts.at("?."):
            self.ts.next()
            a = self._assign()
            self.ts.eat(":")
            b = self._assign()
            return {"t": "ternary", "c": cond, "a": a, "b": b, "line": (cond or {}).get("line", 0)}
        return cond

    def _binary(self, level: int) -> Optional[Node]:
        """Precedence climbing: one loop instead of a 10-level recursive
        descent per operand (node-identical to the descent version —
        tests/test_tokenizer_equivalence.py gates tree equality). All
        operators here are left-associative. Java generics ambiguity:
        `Foo<Bar>` in expression position is rare; '<' parses as binary,
        harmless for taint. A dangling operator (missing right operand)
        consumes the op token and keeps the left chain, matching the
        descent behavior."""
        left = self._unary()
        if left is None:
            return None
        stack: List = []  # (op, left_operand, precedence)
        cap = 1 << 30  # after a dangling op at prec p, only looser (< p) ops
        # may continue — mirrors the descent impl, where the failing level
        # returns and only ancestor levels keep consuming
        while True:
            t = self.ts.peek()
            prec = _BIN_PREC.get(t.text) if t is not None else None
            if prec is None or prec < level or prec >= cap:
                break
            while stack and stack[-1][2] >= prec:
                op, l, _p = stack.pop()
                left = {"t": "binary", "op": op, "l": l, "r": left, "line": l["line"]}
            op = self.ts.next().text
            right = self._unary()
            if right is None:
                cap = prec  # dangling operator: drop it, keep the chain
                continue
            stack.append((op, left, prec))
            left = right
            cap = 1 << 30
        while stack:
            op, l, _p = stack.pop()
            left = {"t": "binary", "op": op, "l": l, "r": left, "line": l["line"]}
        return left

    def _unary(self) -> Optional[Node]:
        t = self.ts.peek()
        if t is not None and t.text in {"!", "~", "+", "-", "++", "--", "typeof", "void", "delete", "await", "new"}:
            if t.text == "new":
                return self._new()
            self.ts.next()
            inner = self._unary()
            return {"t": "unary", "op": t.text, "e": inner, "line": t.line} if inner else None
        return self._postfix()

    def _new(self) -> Optional[Node]:
        t = self.ts.next()  # 'new'
        ctor = self._primary()
        while self.ts.at("."):
            self.ts.next()
            prop = self.ts.next()
            if prop is None:
                break
            ctor = {"t": "member", "obj": ctor, "prop": prop.text, "line": prop.line}
        if not self.js and self.ts.at("<"):
            # java explicit/diamond type arguments: new ArrayList<>(),
            # new Tuple2<String, Double>(a, b) — skip so the '(' arg list
            # parses (dropping them once desynced the statement and lost
            # taint through ctor args; found by the real-code corpus)
            self._skip_type_args()
        args: List[Node] = []
        # java array creation: new T[expr]... / new T[]{init, ...}
        saw_array = False
        while self.ts.at("["):
            saw_array = True
            self.ts.next()
            if not self.ts.at("]"):
                dim = self.expression()
                if dim is not None:
                    args.append(dim)
            if not self.ts.eat("]"):
                self.ts.skip_until("]")
        if saw_array and self.ts.at("{"):
            # array initializer — keep elements as args so taint flows through
            self.ts.next()
            while not self.ts.at("}") and self.ts.peek() is not None:
                e = self.expression()
                if e is not None:
                    args.append(e)
                if not self.ts.eat(","):
                    break
            self.ts.eat("}")
        if self.ts.at("("):
            args = args + self._arg_list()
        node: Node = {"t": "new", "ctor": ctor, "args": args, "line": t.line}
        return self._postfix_chain(node)

    def _arg_list(self) -> List[Node]:
        self.ts.next()  # '('
        args: List[Node] = []
        while True:
            t = self.ts.peek()
            if t is None or t.text == ")":
                self.ts.next()
                break
            # spread argument `f(...xs)`: the spread-ee IS the argument for
            # taint purposes (the reference collects identifiers under the
            # spread_element child of arguments)
            self.ts.eat("...")
            e = self.expression()
            if e is not None:
                args.append(e)
            if not self.ts.eat(","):
                if not self.ts.eat(")"):
                    self.ts.skip_until(")")
                break
        return args

    def _postfix(self) -> Optional[Node]:
        node = self._primary()
        return self._postfix_chain(node) if node is not None else None

    def _postfix_chain(self, node: Node) -> Node:
        while True:
            t = self.ts.peek()
            if t is None:
                return node
            if t.text in (".", "?.", "::"):
                self.ts.next()
                prop = self.ts.peek()
                if prop is None or prop.kind != "id":
                    return node
                self.ts.next()
                if self.ts.at("("):
                    args = self._arg_list()
                    # invocation line = start of the whole chain (tree-sitter
                    # method_invocation start_point semantics)
                    node = {
                        "t": "call",
                        "callee": {"t": "member", "obj": node, "prop": prop.text, "line": prop.line},
                        "args": args,
                        "line": node["line"],
                    }
                else:
                    node = {"t": "member", "obj": node, "prop": prop.text, "line": prop.line}
            elif t.text == "(":
                args = self._arg_list()
                node = {"t": "call", "callee": node, "args": args, "line": node["line"]}
            elif t.text == "[":
                self.ts.next()
                idx = self.expression()
                if not self.ts.eat("]"):
                    self.ts.skip_until("]")
                node = {"t": "index", "obj": node, "idx": idx, "line": node["line"]}
            elif t.text in ("++", "--"):
                self.ts.next()
            else:
                return node

    def _primary(self) -> Optional[Node]:
        t = self.ts.peek()
        if t is None:
            return None
        if t.kind == "str":
            self.ts.next()
            return {"t": "lit", "kind": "str", "val": t.text[1:-1], "line": t.line}
        if t.kind == "num":
            self.ts.next()
            return {"t": "lit", "kind": "num", "val": t.text, "line": t.line}
        if t.kind == "template":
            self.ts.next()
            return self._template(t.text, t.line)
        if t.kind == "regex":
            self.ts.next()
            return {"t": "lit", "kind": "regex", "val": t.text, "line": t.line}
        if t.text == "(":
            # arrow/lambda parameter list: js `(a, b) =>`, java `(a, b) ->`
            arrow = self._try_arrow("=>" if self.js else "->")
            if arrow is not None:
                return arrow
            self.ts.next()
            inner = self.expression()
            if not self.ts.eat(")"):
                self.ts.skip_until(")")
            return inner
        if self.js and t.text == "{":
            return self._objlit(t.line)
        if t.text == "[":
            self.ts.next()
            items = []
            while not self.ts.at("]") and self.ts.peek() is not None:
                e = self.expression()
                if e is not None:
                    items.append(e)
                if not self.ts.eat(","):
                    break
            self.ts.eat("]")
            return {"t": "arraylit", "items": items, "line": t.line}
        if t.kind == "id":
            if self.js and t.text == "function":
                return self._function_expr()
            if not self.js and t.text == "switch":
                sw = self._switch_expr(t.line)
                if sw is not None:
                    return sw
            self.ts.next()
            if t.text in ("true", "false"):
                return {"t": "lit", "kind": "bool", "val": t.text, "line": t.line}
            if t.text in ("null", "undefined", "None"):
                return {"t": "lit", "kind": "null", "val": t.text, "line": t.line}
            # single-param arrow/lambda: js `x => ...`, java `x -> ...`
            if self.ts.at("=>" if self.js else "->"):
                self.ts.next()
                body = self._arrow_body(t.line)
                return {"t": "arrow", "params": [t.text], "body": body, "line": t.line}
            return {"t": "name", "id": t.text, "line": t.line}
        # unknown punct. A closing delimiter (or statement separator)
        # belongs to the ENCLOSING construct — consuming it here once
        # swallowed a ')' and desynced the rest of the file (the enclosing
        # paren-expr then skip_until'd to the NEXT ')' — found by the
        # real-code corpus). Statement-level callers guarantee progress.
        if t.text in (")", "]", "}", ";", ",", ":"):
            return None
        self.ts.next()
        return None

    _SWITCH_NOISE = {
        "case", "default", "yield", "new", "return", "throw", "break",
        "var", "int", "long", "double", "float", "boolean", "char", "byte",
        "short", "String", "true", "false", "null", "instanceof", "when",
    }

    def _switch_expr(self, line: int) -> Optional[Node]:
        """Java 14+ switch EXPRESSION in value position (`x = switch (s) {
        case A -> e1; default -> e2; };`). The subject and every `-> expr`
        arm parse as real expression nodes (sink calls inside arms are
        detected, taint propagates out — the reference's collect_identifiers
        walks the whole tree-sitter switch subtree,
        plugins/java/taint_visitor.py:85-89,202). Block arms (`-> { yield
        ...; }`) degrade to bare-identifier collection: propagation-faithful,
        but a sink CALL inside a yield block is not matched — documented
        approximation. Returns None (no tokens consumed) if what follows
        isn't `switch (`."""
        save = self.ts.i
        self.ts.next()  # 'switch'
        if not self.ts.at("("):
            self.ts.i = save
            return None
        self.ts.next()
        subject = self.expression()
        if not self.ts.eat(")"):
            self.ts.skip_until(")")
        if not self.ts.at("{"):
            return {"t": "switchexpr", "subject": subject, "arms": [], "line": line}
        self.ts.next()
        arms: List[Node] = []
        depth = 1
        while self.ts.peek() is not None and depth:
            t = self.ts.peek()
            if t.text == "}":
                depth -= 1
                self.ts.next()
                continue
            if t.text == "{":
                depth += 1
                self.ts.next()
                continue
            if depth == 1 and t.text in ("case", "default"):
                self.ts.next()
                # pattern region up to '->' (new-style) or ':' (old-style)
                while self.ts.peek() is not None and self.ts.peek().text not in ("->", ":", "{", "}"):
                    self.ts.next()
                if self.ts.eat("->"):
                    if self.ts.at("{"):
                        continue  # block arm: ids collected by the fallback below
                    e = self.expression()
                    if e is not None:
                        arms.append(e)
                    self.ts.eat(";")
                else:
                    self.ts.eat(":")
                continue
            # fallback (old-style bodies, yield blocks): keep identifier
            # tokens so taint still propagates out of the arm
            if t.kind == "id" and t.text not in self._SWITCH_NOISE:
                arms.append({"t": "name", "id": t.text, "line": t.line})
            self.ts.next()
        return {"t": "switchexpr", "subject": subject, "arms": arms, "line": line}

    def _skip_type_args(self) -> None:
        """Skip balanced <...> from an opening '<'; composite shift tokens
        ('>>', '>>>') close several angles at once (see javaparse
        _skip_generics — same counting rule)."""
        depth = 0
        while self.ts.peek() is not None:
            txt = self.ts.next().text
            if "<" in txt and set(txt) <= set("<="):
                depth += txt.count("<")
            elif ">" in txt and set(txt) <= set(">="):
                depth -= txt.count(">")
                if depth <= 0:
                    return

    # -- js helpers ------------------------------------------------------------

    def _try_arrow(self, arrow_tok: str = "=>") -> Optional[Node]:
        """Lookahead for `( a, b ) =>` (js) / `( a, b ) ->` (java lambda)
        from a '(' position."""
        save = self.ts.i
        depth = 0
        j = self.ts.i
        toks = self.ts.toks
        while j < len(toks):
            txt = toks[j].text
            if txt == "(":
                depth += 1
            elif txt == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j + 1 >= len(toks) or toks[j + 1].text != arrow_tok:
            return None
        line = toks[save].line
        self.ts.next()  # '('
        params: List[str] = []
        while not self.ts.at(")") and self.ts.peek() is not None:
            tok = self.ts.next()
            if tok.kind == "id":
                params.append(tok.text)
        self.ts.next()  # ')'
        self.ts.next()  # '=>'
        body = self._arrow_body(line)
        return {"t": "arrow", "params": params, "body": body, "line": line}

    def _arrow_body(self, line: int) -> Node:
        if self.ts.at("{") and self.parse_block is not None:
            return self.parse_block(self.ts)
        e = self.expression()
        return {"t": "block", "stmts": [{"t": "exprstmt", "e": e, "line": line}] if e else [], "line": line}

    def _function_expr(self) -> Node:
        t = self.ts.next()  # 'function'
        name = None
        if self.ts.at_kind("id"):
            name = self.ts.next().text
        params: List[str] = []
        if self.ts.at("("):
            self.ts.next()
            while not self.ts.at(")") and self.ts.peek() is not None:
                tok = self.ts.next()
                if tok.kind == "id":
                    params.append(tok.text)
            self.ts.next()
        body = self.parse_block(self.ts) if (self.ts.at("{") and self.parse_block) else {"t": "block", "stmts": [], "line": t.line}
        return {"t": "funcexpr", "name": name, "params": params, "body": body, "line": t.line}

    def _objlit(self, line: int) -> Node:
        self.ts.next()  # '{'
        props = []
        while not self.ts.at("}") and self.ts.peek() is not None:
            key_tok = self.ts.next()
            if key_tok.text == ",":
                continue
            if self.ts.eat(":"):
                val = self.expression()
                if val is not None:
                    props.append((key_tok.text, val))
            elif self.ts.at("(") :
                self.ts.skip_balanced("(", ")")
                if self.ts.at("{"):
                    self.ts.skip_balanced("{", "}")
            # shorthand {a, b} — treat key as a name value
            elif key_tok.kind == "id":
                props.append((key_tok.text, {"t": "name", "id": key_tok.text, "line": key_tok.line}))
        self.ts.eat("}")
        return {"t": "objlit", "props": props, "line": line}

    def _template(self, raw: str, line: int) -> Node:
        """Re-lex a template literal into string parts + embedded expressions."""
        from .ctok import TokStream as TS
        from .ctok import tokenize

        parts: List[Node] = []
        i, n = 1, len(raw) - 1
        buf = []
        while i < n:
            c = raw[i]
            if c == "$" and i + 1 < n and raw[i + 1] == "{":
                if buf:
                    parts.append({"t": "lit", "kind": "str", "val": "".join(buf), "line": line})
                    buf = []
                depth, j = 1, i + 2
                while j < n and depth:
                    if raw[j] == "{":
                        depth += 1
                    elif raw[j] == "}":
                        depth -= 1
                    j += 1
                inner = raw[i + 2 : j - 1]
                sub = ExprParser(TS(tokenize(inner, js=self.js)), js=self.js, parse_block=self.parse_block).expression()
                if sub is not None:
                    parts.append(sub)
                i = j
            else:
                buf.append(c)
                i += 1
        if buf:
            parts.append({"t": "lit", "kind": "str", "val": "".join(buf), "line": line})
        return {"t": "template", "parts": parts, "line": line}
