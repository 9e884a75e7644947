"""Shared tokenizer for C-family syntax (Java / JavaScript subsets).

Hand-rolled because tree-sitter is unavailable in this environment
(SURVEY.md §7): the detector tiers only need the small node vocabulary the
reference visitors consume, so a tolerant tokenizer + recursive-descent
parser over it is sufficient for parity on real-world-shaped code.
"""

from __future__ import annotations

from typing import List, NamedTuple


class Tok(NamedTuple):
    kind: str  # id | str | num | punct | template
    text: str
    line: int


import re as _re

_PUNCT3 = (">>>", "===", "!==", "**=", "...", "<<=", ">>=")
_PUNCT2 = (
    "==", "!=", "<=", ">=", "&&", "||", "++", "--", "+=", "-=", "*=", "/=",
    "%=", "&=", "|=", "^=", "->", "=>", "::", "<<", ">>", "??", "?.",
)

# C-speed scanners for the long-token bodies (semantics byte-identical to
# the original per-char loops — tests/test_parser_grammar_fuzz.py includes
# an old-vs-new equivalence gate over fixtures + fuzz programs)
_WS = _re.compile(r"[ \t\r\f\v]+")
_ID_BODY = _re.compile(r"[\w$]*")  # \w ≈ isalnum ∪ {_} incl. unicode letters
_NUM_BODY = _re.compile(r"(?:[\w.]|(?<=[eE])[+-])*")
_STR_BODY = {q: _re.compile(r"(?:\\[\s\S]|[^" + q + r"\\\n])*") for q in ("'", '"')}


def tokenize(src: str) -> List[Tok]:
    toks: List[Tok] = []
    i, n, line = 0, len(src), 1
    while i < n:
        ch = src[i]
        if ch == "\n":
            line += 1
            i += 1
            continue
        if ch in " \t\r\f\v":
            i = _WS.match(src, i).end()
            continue
        # comments
        if ch == "/" and i + 1 < n:
            nxt = src[i + 1]
            if nxt == "/":
                j = src.find("\n", i)
                i = n if j < 0 else j
                continue
            if nxt == "*":
                j = src.find("*/", i + 2)
                seg = src[i : (j + 2 if j >= 0 else n)]
                line += seg.count("\n")
                i = n if j < 0 else j + 2
                continue
        # strings — body scanned in C; quirks preserved: an unterminated
        # string swallows the newline WITHOUT bumping the line counter, and
        # a trailing backslash at EOF is included
        if ch in "'\"":
            j = _STR_BODY[ch].match(src, i + 1).end()
            if j < n and src[j] == "\\":  # lone trailing backslash at EOF
                j = n
                toks.append(Tok("str", src[i:j], line))
                i = j
                continue
            if j < n:  # closing quote or tolerated newline — include it
                toks.append(Tok("str", src[i : j + 1], line))
                i = j + 1
            else:  # EOF, unterminated
                toks.append(Tok("str", src[i:j], line))
                i = j
            continue
        if ch == "`":  # JS template literal (kept whole; interpolations re-lexed later)
            j = i + 1
            depth = 0
            while j < n:
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if c == "}" and depth:
                    depth -= 1
                elif c == "`" and not depth:
                    break
                j += 1
            seg = src[i : j + 1]
            toks.append(Tok("template", seg, line))
            line += seg.count("\n")
            i = j + 1
            continue
        if ch.isdigit() or (ch == "." and i + 1 < n and src[i + 1].isdigit()):
            j = _NUM_BODY.match(src, i).end()
            toks.append(Tok("num", src[i:j], line))
            i = j
            continue
        if ch.isalpha() or ch in "_$@":
            j = _ID_BODY.match(src, i + 1).end()
            toks.append(Tok("id", src[i:j], line))
            i = j
            continue
        got = False
        for group in (_PUNCT3, _PUNCT2):
            for p in group:
                if src.startswith(p, i):
                    toks.append(Tok("punct", p, line))
                    i += len(p)
                    got = True
                    break
            if got:
                break
        if not got:
            toks.append(Tok("punct", ch, line))
            i += 1
    return toks


class TokStream:
    def __init__(self, toks: List[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, off: int = 0) -> Tok | None:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok | None:
        t = self.peek()
        self.i += 1
        return t

    def at(self, text: str, off: int = 0) -> bool:
        t = self.peek(off)
        return t is not None and t.text == text

    def at_kind(self, kind: str, off: int = 0) -> bool:
        t = self.peek(off)
        return t is not None and t.kind == kind

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.i += 1
            return True
        return False

    def skip_until(self, *stops: str, balance: bool = True) -> None:
        """Skip tokens until one of `stops` at depth 0 (consumes it)."""
        depth = 0
        while True:
            t = self.next()
            if t is None:
                return
            if balance:
                if t.text in "([{":
                    depth += 1
                elif t.text in ")]}":
                    if depth == 0 and t.text in stops:
                        return
                    depth = max(0, depth - 1)
                    continue
            if depth == 0 and t.text in stops:
                return

    def skip_balanced(self, open_: str, close: str) -> None:
        """Current token must be `open_`; skips to matching `close`."""
        depth = 0
        while True:
            t = self.next()
            if t is None:
                return
            if t.text == open_:
                depth += 1
            elif t.text == close:
                depth -= 1
                if depth == 0:
                    return
