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

# One master pattern classifies every token in a single C call (1.9× the
# per-char loop). Semantics are byte-identical to the original tokenizer —
# tests/test_tokenizer_equivalence.py keeps the original verbatim and
# compares token streams over fixtures, fuzz programs, and noise, covering
# the quirks: unterminated strings swallow the newline WITHOUT bumping the
# line counter, trailing backslashes at EOF are included, numbers accept
# letters/dots with +/- only after e/E. Alternation order matters: comments
# before '/='-style punct, template backtick handed to a nesting-aware scan.
_MASTER = _re.compile(
    r"(?P<nl>\n)"
    r"|(?P<ws>[ \t\r\f\v]+)"
    r"|(?P<lc>//[^\n]*)"
    r"|(?P<bc>/\*.*?(?:\*/|\Z))"
    r"|(?P<str>'(?:\\[\s\S]|[^'\\\n])*\\?(?:'|\n|\Z)"
    r"|\"(?:\\[\s\S]|[^\"\\\n])*\\?(?:\"|\n|\Z))"
    r"|(?P<tpl>`)"
    r"|(?P<num>(?:\d|\.(?=\d))(?:[\w.]|(?<=[eE])[+-])*)"
    r"|(?P<id>(?:[^\W\d]|[_$@])[\w$]*)"
    r"|(?P<p>" + "|".join(_re.escape(p) for p in _PUNCT3 + _PUNCT2) + r")"
    r"|(?P<c>[\s\S])",
    _re.S,
)


# tokens after which a '/' can START an operand → regex literal, not
# division (the classic JS lexer ambiguity). Conservative: after ')', ']',
# '}' and postfix ++/-- we keep division — `if(x)/re/.test(y)` is legal JS
# but vanishingly rare, while `(a+b)/c` is everywhere.
_REGEX_PREV_KEYWORDS = frozenset(
    "return typeof instanceof in of new delete void case do else throw yield await".split()
)


def _regex_allowed(toks: List[Tok]) -> bool:
    if not toks:
        return True
    prev = toks[-1]
    if prev.kind == "punct":
        return prev.text not in (")", "]", "}", "++", "--")
    if prev.kind == "id":
        return prev.text in _REGEX_PREV_KEYWORDS
    return False  # after an operand (num/str/template/regex): division


def _scan_regex(src: str, i: int) -> int:
    """src[i] == '/': end index past body+flags, or -1 if not a regex
    literal (newline or EOF before the closing '/')."""
    j, n = i + 1, len(src)
    in_class = False
    while j < n:
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == "\n":
            return -1
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "/":
            j += 1
            while j < n and src[j].isalpha():
                j += 1
            return j
        j += 1
    return -1


def tokenize(src: str, js: bool = False) -> List[Tok]:
    """js=True additionally lexes JS regex literals (kind 'regex'): without
    them, a quote or brace inside /["']/ starts a phantom string/scope and
    desyncs everything after it — found by minified jQuery in the
    real-code corpus. Java mode (default) is byte-identical to before."""
    toks: List[Tok] = []
    i, n, line = 0, len(src), 1
    scan = _MASTER.match
    append = toks.append
    while i < n:
        # Java text block: """ ... """ lexes as ONE string token (without
        # this, '"""' lexed as ""+" and the block BODY lexed as code —
        # found by the modern-syntax probe battery). Java-mode only: JS has
        # no text blocks.
        if not js and src.startswith('"""', i):
            end = src.find('"""', i + 3)
            end = n if end < 0 else end + 3
            seg = src[i:end]
            append(Tok("str", seg, line))
            line += seg.count("\n")
            i = end
            continue
        m = scan(src, i)
        g = m.lastgroup
        i = m.end()
        if js and src[m.start()] == "/" and g in ("p", "c") and m.group() in ("/", "/="):
            if _regex_allowed(toks):
                end = _scan_regex(src, m.start())
                if end > 0:
                    append(Tok("regex", src[m.start():end], line))
                    i = end
                    continue
            append(Tok("punct", m.group(), line))
            continue
        if g == "id":
            append(Tok("id", m.group(), line))
        elif g == "p" or g == "c":
            append(Tok("punct", m.group(), line))
        elif g == "ws" or g == "lc":
            pass
        elif g == "nl":
            line += 1
        elif g == "num":
            append(Tok("num", m.group(), line))
        elif g == "str":
            append(Tok("str", m.group(), line))
        elif g == "bc":
            line += m.group().count("\n")
        else:  # tpl — JS template literal; ${} nesting needs a hand scan
            start = i - 1
            j = i
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
            seg = src[start : j + 1]
            append(Tok("template", seg, line))
            line += seg.count("\n")
            i = j + 1
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
