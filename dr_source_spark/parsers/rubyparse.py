"""Minimal structural Ruby parser (node vocabulary of the reference Ruby
taint visitor: plugins/ruby/taint_visitor.py:124-158 — methods, assignments,
calls with and without parentheses, element references `a[:k]`, interpolated
strings, do/brace blocks).

In Ruby every `a.b` is a call node (tree-sitter has no member-access), so
dotted access parses to {"t": "rcall", recv, name, args} here too.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

Node = Dict[str, Any]

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<nl>\n)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<sym>:[A-Za-z_][A-Za-z0-9_]*[?!]?)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<id>@{0,2}\$?[A-Za-z_][A-Za-z0-9_]*[?!]?)
  | (?P<p2><<~|<<-|==|!=|<=|>=|&&|\|\||=>|::|\+=|-=|<<|\*\*)
  | (?P<p1>[{}()\[\].,=<>+\-*/%!&|^?])
    """,
    re.VERBOSE,
)

_OPENERS = {"def", "class", "module", "if", "unless", "while", "until", "case", "begin", "do", "for"}

# heredoc openers: <<~TAG / <<-TAG / quoted tags are unambiguous (a shift
# can't be followed by ~ or -IDENT or a quote without whitespace), so ANY
# tag case is accepted there (<<~eos is common real Ruby); bare <<TAG only
# counts with no space and an UPPERCASE tag (the overwhelming convention),
# so shifts like `arr << Const` (spaced) or `n <<bits` stay code.
_HEREDOC_OPEN = re.compile(r"<<([~-]?)([\"'`]?)([A-Za-z_][A-Za-z0-9_]*)\2")


def _heredoc_ok(squig: str, q: str, tag: str) -> bool:
    return bool(squig or q) or (tag[0].isupper() or tag[0] == "_")


# interpolation fragments safe to re-emit inside a synthetic "..." literal
# (no quotes/backslashes/braces that would desync the tokenizer)
_SAFE_INTERP_RE = re.compile(r"\#\{([^{}\"\\\n]*)\}")


def _interp_payload(fragments: List[str]) -> str:
    """Rebuild a double-quoted literal carrying a body's #{...} fragments so
    the parser's interpolated-string walk sees them (tree-sitter walks
    interpolation inside heredocs/%Q; losing it drops real taint flows like
    ``system(<<~CMD)`` with ``#{params[:x]}`` in the body)."""
    if not fragments:
        return '""'
    return '"' + "".join("#{" + f + "}" for f in fragments) + '"'


def _blank_noncode(src: str) -> str:
    """Blank heredoc bodies and =begin/=end comment blocks (line count
    preserved) before tokenizing — their content lines would otherwise lex
    as code: a heredoc containing sink-shaped text could false-positive the
    AST tier, and a stray 'end' inside one desyncs statement recovery.

    Interpolation inside a non-quoted heredoc body IS preserved: each
    opener becomes a double-quoted literal carrying the body's safe
    ``#{...}`` fragments (at the opener's line — an approximation of the
    body position tree-sitter would report), so taint flowing through a
    heredoc survives. A single-quoted tag (``<<~'EOS'``) suppresses
    interpolation, as in Ruby."""
    if "<<" not in src and "=begin" not in src:
        return src
    out: List[str] = []
    # open heredocs, in order; body lines always belong to the FIRST entry
    pending: List[Dict[str, Any]] = []
    payloads: Dict[int, str] = {}
    n_ph = 0
    in_comment = False
    for line in src.split("\n"):
        if pending:
            if line.strip() == pending[0]["tag"]:
                h = pending.pop(0)
                payloads[h["ph"]] = _interp_payload(h["frags"])
            elif pending[0]["interp"]:
                pending[0]["frags"].extend(_SAFE_INTERP_RE.findall(line))
            out.append("")
            continue
        if in_comment:
            if line.startswith("=end"):
                in_comment = False
            out.append("")
            continue
        if line.startswith("=begin"):
            in_comment = True
            out.append("")
            continue
        # detect openers on a POSITION-PRESERVING probe: string-literal
        # bodies are padded to spaces (not removed) so every probe match
        # span maps 1:1 onto the raw line, and the comment tail is
        # truncated — '<<~EOT' mentioned in a comment or string must not
        # swallow the rest of the file (conservative: a '#' inside a regex
        # literal truncates the probe, which can only MISS openers). A
        # string literal that IS a heredoc tag (``<<~'EOS'`` / ``<<"TAG"``)
        # survives the padding so quoted-tag heredocs are detected.
        def _pad(m: "re.Match[str]", _line=line) -> str:
            if re.search(r"<<[~-]?$", _line[max(0, m.start() - 3) : m.start()]):
                return m.group(0)  # quote is a heredoc tag, keep it
            return " " * len(m.group(0))

        probe = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"", _pad, line)
        hash_at = probe.find("#")
        if hash_at != -1:
            probe = probe[:hash_at]
        matches = [m for m in _HEREDOC_OPEN.finditer(probe) if _heredoc_ok(*m.groups())]
        if matches:
            for m in matches:
                _squig, q, tag = m.groups()
                pending.append({"tag": tag, "interp": q != "'", "ph": n_ph, "frags": []})
                n_ph += 1
            # each opener becomes a placeholder, patched to a string literal
            # (empty, or carrying the body's interpolation) once its body
            # ends. Splice at the PROBE spans, right-to-left so earlier
            # offsets stay valid — an opener-shaped token inside a string
            # literal is space-padding in the probe, so it can never match
            # there and never consumes a placeholder (it passes through to
            # the tokenizer's own string handling unchanged).
            for m, ph in zip(reversed(matches), reversed(range(n_ph - len(matches), n_ph))):
                s, e = m.span()
                line = line[:s] + f"\x00H{ph}\x00" + line[e:]
        out.append(line)
    text = "\n".join(out)
    if n_ph:
        text = re.sub(r"\x00H(\d+)\x00", lambda m: payloads.get(int(m.group(1)), '""'), text)
    return text


_PCT_TYPES = set("wWiIqQrxs")
_PAIRED = {"(": ")", "[": "]", "{": "}", "<": ">"}
_PCT_DELIMS = set("|/!^~") | set(_PAIRED)

# cheap probe: only run the per-character scan when a %-literal opener can
# actually occur — `a % b` modulo alone must not pay an O(n) Python loop
# (per-file fixed cost in the detector hot path)
_PCT_PROBE = re.compile(r"%[wWiIqQrxs][(\[{<|/!^~]|%\{")


def _blank_percent_literals(src: str) -> str:
    """Replace %-literals (%w[..] %i(..) %q{..} %Q %r %x %s and bare %{..})
    with an empty string literal, preserving newline count — their content
    would otherwise lex as code (a %q() body containing sink-shaped text
    could false-positive the AST tier, and unbalanced brackets inside a
    word list desync statement recovery). String/comment-aware scan;
    paired delimiters nest; an UNCLOSED literal is left untouched (the
    conservative failure mode: we can only miss a literal, never swallow
    trailing code). Interpolating forms (%Q %W %I %x %r, bare %{})
    preserve their safe ``#{...}`` fragments in the replacement literal so
    taint through them survives; %q/%w/%i/%s are single-quote-like and
    blank fully. Remaining approximation: a modulo written flush against a
    type-letter identifier (``a%s(b)``) reads as a literal — real code
    spaces its operators."""
    if "%" not in src or _PCT_PROBE.search(src) is None:
        return src
    out: List[str] = []
    i, n = 0, len(src)
    mode: Optional[str] = None  # None | "'" | '"' | '#'
    while i < n:
        c = src[i]
        if mode == "#":
            if c == "\n":
                mode = None
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
        if c == "#":
            mode = "#"
            out.append(c)
            i += 1
            continue
        if c in ("'", '"'):
            mode = c
            out.append(c)
            i += 1
            continue
        if c == "%":
            j = i + 1
            if j + 1 < n and src[j] in _PCT_TYPES and src[j + 1] in _PCT_DELIMS:
                delim_pos = j + 1
                interp = src[j] in "QWIxr"  # %q/%w/%i/%s are single-quote-like
            elif j < n and src[j] == "{":
                delim_pos = j
                interp = True
            else:
                out.append(c)
                i += 1
                continue
            od = src[delim_pos]
            cd = _PAIRED.get(od, od)
            depth = 1
            k = delim_pos + 1
            nl = 0
            while k < n and depth:
                ch = src[k]
                if ch == "\\":
                    k += 2
                    continue
                if ch == "\n":
                    nl += 1
                if od in _PAIRED and ch == od:
                    depth += 1
                elif ch == cd:
                    depth -= 1
                k += 1
            if depth:  # unclosed: treat as modulo, leave untouched
                out.append(c)
                i += 1
                continue
            frags = _SAFE_INTERP_RE.findall(src[delim_pos + 1 : k - 1]) if interp else []
            out.append(_interp_payload(frags) + "\n" * nl)
            i = k
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokens(src: str) -> List[Tuple[str, str, int]]:
    toks = []
    line = 1
    for m in _TOKEN_RE.finditer(src):
        kind = m.lastgroup
        text = m.group()
        if kind == "nl":
            line += 1
            toks.append(("nl", "\n", line - 1))
            continue
        if kind == "comment":
            continue
        toks.append((kind, text, line))
    return toks


class _P:
    def __init__(self, toks):
        self.toks = [t for t in toks]
        self.i = 0

    def peek(self, off=0, skip_nl=False):
        j = self.i + off
        if skip_nl:
            while j < len(self.toks) and self.toks[j][0] == "nl":
                j += 1
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def skip_nl(self):
        while self.peek() is not None and self.peek()[0] == "nl":
            self.next()

    def at(self, text, off=0):
        t = self.peek(off)
        return t is not None and t[1] == text


def parse_ruby(src: str) -> Node:
    p = _P(_tokens(_blank_percent_literals(_blank_noncode(src))))
    # top level must NOT stop at 'end': an unmatched 'end' (an opener the
    # parser doesn't model — for-loops, heredoc bodies lexed as code) would
    # truncate the rest of the file; _stmt consumes strays harmlessly
    # (found by the real-code corpus: a single stray 'end' dropped every
    # finding below it)
    stmts = _stmts(p, stop=set())
    return {"t": "program", "stmts": stmts, "line": 1}


def _stmts(p: _P, stop: set) -> List[Node]:
    out: List[Node] = []
    while True:
        p.skip_nl()
        t = p.peek()
        if t is None:
            return out
        if t[0] == "id" and t[1] in stop:
            return out
        s = _stmt(p)
        if s is not None:
            out.append(s)


def _stmt(p: _P) -> Optional[Node]:
    t = p.peek()
    if t is None:
        return None
    kind, text, line = t
    if kind == "id":
        if text in ("class", "module"):
            p.next()
            while p.peek() is not None and p.peek()[0] != "nl":
                p.next()  # name / superclass
            body = _stmts(p, stop={"end"})
            p.next()  # 'end'
            return {"t": "container", "stmts": body, "line": line}
        if text == "def":
            p.next()
            name_tok = p.next()
            name = name_tok[1] if name_tok else "?"
            params: List[str] = []
            if p.at("("):
                p.next()
                while p.peek() is not None and not p.at(")"):
                    tok = p.next()
                    if tok[0] == "id":
                        params.append(tok[1])
                p.next()
            else:
                while p.peek() is not None and p.peek()[0] != "nl":
                    tok = p.next()
                    if tok[0] == "id":
                        params.append(tok[1])
            body = _stmts(p, stop={"end"})
            p.next()  # end
            return {"t": "method", "name": name, "params": params, "body": {"t": "block", "stmts": body, "line": line}, "line": line}
        if text in ("if", "unless", "while", "until", "case"):
            p.next()
            cond = _expr(p)
            body = _stmts(p, stop={"end", "else", "elsif", "when"})
            branches = [body]
            while p.peek() is not None and p.peek()[1] in ("else", "elsif", "when"):
                p.next()
                if p.peek() is not None and p.peek()[0] != "nl":
                    _expr(p)  # branch condition (walked? keep simple: parse+drop)
                branches.append(_stmts(p, stop={"end", "else", "elsif", "when"}))
            p.next()  # end
            all_stmts = [s for b in branches for s in b]
            return {"t": "ctrl", "cond": [cond] if cond else [], "body": {"t": "container", "stmts": all_stmts, "line": line}, "line": line}
        if text in ("begin",):
            p.next()
            body = _stmts(p, stop={"end", "rescue", "ensure"})
            while p.peek() is not None and p.peek()[1] in ("rescue", "ensure"):
                p.next()
                body += _stmts(p, stop={"end", "rescue", "ensure"})
            p.next()
            return {"t": "container", "stmts": body, "line": line}
        if text in ("return", "puts", "print", "p", "raise") and text != "puts":
            pass  # fallthrough: treated as calls/expressions below
        if text in ("require", "require_relative", "attr_accessor", "attr_reader", "private", "public"):
            # skip to end of line
            while p.peek() is not None and p.peek()[0] != "nl":
                p.next()
            return None
        if text == "return":
            p.next()
            e = None
            if p.peek() is not None and p.peek()[0] != "nl":
                e = _expr(p)
            return {"t": "ret", "e": e, "line": line}
        if text == "end":
            p.next()
            return None
    e = _expr(p, stmt_level=True)
    if e is None:
        p.next()
        return None
    # do-block attached?
    nxt = p.peek(skip_nl=False)
    if nxt is not None and nxt[1] == "do":
        p.next()
        if p.at("|"):
            p.next()
            while p.peek() is not None and not p.at("|"):
                p.next()
            p.next()
        body = _stmts(p, stop={"end"})
        p.next()
        return {"t": "exprstmt", "e": e, "doblock": {"t": "doblock", "stmts": body, "line": line}, "line": line}
    return {"t": "exprstmt", "e": e, "line": line}


_BIN = [{"||"}, {"&&"}, {"==", "!=", "<", ">", "<=", ">=", "=~"}, {"+", "-", "<<"}, {"*", "/", "%", "**"}]


def _expr(p: _P, level: int = -1, stmt_level: bool = False) -> Optional[Node]:
    if level == -1:
        left = _expr(p, 0, stmt_level)
        if left is not None and p.at("="):
            line = left["line"]
            p.next()
            right = _expr(p, -1)
            return {"t": "assign", "target": left, "value": right, "line": line}
        return left
    if level >= len(_BIN):
        return _postfix(p, stmt_level)
    left = _expr(p, level + 1, stmt_level)
    while True:
        t = p.peek()
        if left is None or t is None or t[1] not in _BIN[level]:
            return left
        p.next()
        right = _expr(p, level + 1)
        if right is None:
            return left
        left = {"t": "binary", "op": t[1], "l": left, "r": right, "line": left["line"]}


_ARG_START = ("str", "sym", "num")


def _postfix(p: _P, stmt_level: bool = False) -> Optional[Node]:
    node = _primary(p)
    if node is None:
        return None
    while True:
        t = p.peek()
        if t is None:
            break
        if t[1] == "." or t[1] == "::" or t[1] == "&.":
            p.next()
            m = p.peek()
            if m is None or m[0] != "id":
                break
            p.next()
            args = None
            if p.at("("):
                args = _parens_args(p)
            node = {"t": "rcall", "recv": node, "name": m[1], "args": args or [], "paren": args is not None, "line": node["line"]}
        elif t[1] == "[":
            p.next()
            idx = _expr(p)
            while p.peek() is not None and not p.at("]"):
                p.next()
            p.next()
            node = {"t": "index", "obj": node, "idx": idx, "line": node["line"]}
        elif t[1] == "(" and node["t"] == "name":
            args = _parens_args(p)
            node = {"t": "rcall", "recv": None, "name": node["id"], "args": args, "paren": True, "line": node["line"]}
        else:
            break
    # paren-less args at statement level: `logger.info "..."` / `puts x`
    if stmt_level and node["t"] in ("rcall", "name"):
        nxt = p.peek()
        if nxt is not None and nxt[0] != "nl" and (
            nxt[0] in _ARG_START or (nxt[0] == "id" and nxt[1] not in _OPENERS and nxt[1] not in ("end", "then"))
        ):
            args = [
            ]
            while True:
                e = _expr(p)
                if e is None:
                    break
                args.append(e)
                if not p.at(","):
                    break
                p.next()
            if node["t"] == "name":
                node = {"t": "rcall", "recv": None, "name": node["id"], "args": args, "paren": False, "line": node["line"]}
            else:
                if not node["args"]:
                    node = dict(node, args=args, paren=False)
    return node


def _parens_args(p: _P) -> List[Node]:
    p.next()  # '('
    args: List[Node] = []
    while True:
        p.skip_nl()
        if p.peek() is None or p.at(")"):
            break
        e = _expr(p)
        if e is None:
            p.next()
            continue
        args.append(e)
        p.skip_nl()
        if not p.at(","):
            break
        p.next()
    if p.at(")"):
        p.next()
    return args


_INTERP_RE = re.compile(r"\#\{([^{}]*)\}")


def _primary(p: _P) -> Optional[Node]:
    t = p.peek()
    if t is None:
        return None
    kind, text, line = t
    if kind == "str":
        p.next()
        quote = text[0]
        val = text[1:-1]
        parts: List[Node] = []
        interp = False
        if quote == '"' and "#{" in val:
            interp = True
            for m in _INTERP_RE.finditer(val):
                inner = m.group(1)
                sub = parse_ruby(inner)
                for s in sub["stmts"]:
                    if s.get("t") == "exprstmt":
                        parts.append(s["e"])
        return {"t": "lit", "kind": "str", "val": val, "interp": interp, "parts": parts, "line": line}
    if kind == "sym":
        p.next()
        return {"t": "lit", "kind": "sym", "val": text, "line": line}
    if kind == "num":
        p.next()
        return {"t": "lit", "kind": "num", "val": text, "line": line}
    if kind == "id":
        p.next()
        if text in ("true", "false", "nil"):
            return {"t": "lit", "kind": "bool", "val": text, "line": line}
        if text in _OPENERS or text == "end":
            return None
        return {"t": "name", "id": text, "line": line}
    if text == "(":
        p.next()
        e = _expr(p)
        while p.peek() is not None and not p.at(")"):
            p.next()
        p.next()
        return e
    if text == "[":
        p.next()
        items = []
        while p.peek() is not None and not p.at("]"):
            e = _expr(p)
            if e is not None:
                items.append(e)
            if not p.at(","):
                break
            p.next()
        if p.at("]"):
            p.next()
        return {"t": "arraylit", "items": items, "line": line}
    if text in ("!", "-", "*", "&"):
        p.next()
        e = _expr(p, len(_BIN) - 1)
        return {"t": "unary", "op": text, "e": e, "line": line} if e else None
    p.next()
    return None
