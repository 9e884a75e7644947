"""Planted-flow recovery across MODERN language constructs (Java 17 /
ES2022 / PHP 8 / Ruby 3) that neither the reference fixtures nor the synth
corpus contain — the same probe methodology as tests/test_realcode.py:
each construct appears before a known source→sink flow, which must still
be detected. A miss means the construct desynced the parser into silent
finding loss (this battery found Java text blocks in round 3)."""

from __future__ import annotations

import pytest

from dr_source_spark.kb import compiled_kb_cached

CKB = compiled_kb_cached(project_dir="/nonexistent")

_J_PLANT = (
    "\nclass DrProbe {\n"
    "    public void h(javax.servlet.http.HttpServletRequest request,"
    " java.sql.Statement st) throws Exception {\n"
    '        String u = request.getParameter("q");\n'
    "        st.executeQuery(u);\n    }\n}\n"
)
JAVA = {
    "text_block": 'class A { String s = """\n  SELECT * FROM t WHERE x = \'y\'\n  """; }',
    "switch_expr": "class A { int m(int d) { int r = switch (d) { case 1 -> 10; case 2, 3 -> 20; default -> { yield 30; } }; return r; } }",
    "record": "record Point(int x, int y) { Point { if (x < 0) throw new IllegalArgumentException(); } }",
    "sealed": "sealed interface Shape permits Circle, Square {}\nfinal class Circle implements Shape {}",
    "type_witness": "class A { void m() { java.util.List<String> l = java.util.Collections.<String>emptyList(); } }",
    "var_decl": "class A { void m() { var list = new java.util.ArrayList<String>(); for (var s : list) { } } }",
    "instanceof_pattern": "class A { void m(Object o) { if (o instanceof String s && s.length() > 2) { int n = s.length(); } } }",
    "anon_class": "class A { Runnable r = new Runnable() { @Override public void run() { int x = 1; } }; }",
    "generic_bound_wild": "class A { void m(java.util.Map<? extends CharSequence, ? super Number> m2) { } }",
    "static_init_labels": "class A { static { int[] a = {1,2}; } void m() { outer: for(;;) { break outer; } } }",
    "ternary_generics": "class A { void m(boolean b) { java.util.List<Integer> x = b ? new java.util.ArrayList<Integer>() : null; } }",
}

_JS_PLANT = "\napp.get('/p', (req, res) => { const c = req.query.cmd; eval(c); });\n"
JS = {
    "private_fields": "class C { #count = 0; #inc() { this.#count++; } static #s = 1; }",
    "tagged_template": "const q = sql`SELECT ${a} FROM ${b}`;",
    "async_gen": "async function* g() { yield await f(); } for await (const x of g()) { }",
    "getters_static_block": "class C { static { C.x = 1; } get v() { return 1; } set v(x) { } }",
    "spread_new": "const o = new Foo(...args, {a: 1});",
    "regex_with_slash": "const m = str.match(/^[a-z]+(?:\\/[a-z]+)*$/);",
    "export_default_obj": "export default { async handler(ev) { return ev; } };",
    "optional_call": "obj?.method?.(arg);",
    "numeric_sep_bigint": "const n = 1_000_000n; const h = 0xFF_AA;",
    "arrow_default_destr": "const f = ({a = 1, b: {c} = {}} = {}, ...rest) => a + c;",
}

_PHP_PLANT = "\n<?php\n$i = $_GET['x'];\nmysqli_query($c, \"SELECT \" . $i);\n?>\n"
PHP = {
    "match_expr": "<?php $r = match($x) { 1, 2 => 'a', default => 'b' }; ?>",
    "attributes": "<?php #[Route('/x', methods: ['GET'])] class C { #[Deprecated] public function m() {} } ?>",
    "enum": "<?php enum Suit: string { case Hearts = 'H'; case Spades = 'S'; public function color(): string { return 'x'; } } ?>",
    "nullsafe": "<?php $v = $obj?->prop?->method(); ?>",
    "named_args_spread": "<?php foo(bar: 1, ...$args); ?>",
    "first_class_callable": "<?php $fn = strlen(...); ?>",
    "readonly_promo": "<?php class P { public function __construct(public readonly int $x, private string $y = 'a') {} } ?>",
    "heredoc": "<?php $s = <<<SQL\nSELECT 'x' FROM t\nSQL;\n$z = 1; ?>",
}

_RB_PLANT = '\nv = params[:cmd]\nsystem("go #{v}")\n'
RUBY = {
    "case_in": "case obj\nin {a: Integer => x}\n  y = x\nin [1, *rest]\n  y = rest\nelse\n  y = 0\nend",
    "endless_def": "def square(x) = x * x",
    "safe_nav": "val = obj&.method&.chain",
    "kwargs_block": "def m(a:, b: 2, **opts, &blk)\n  blk.call(a)\nend",
    "percent_literals": "words = %w[one two three]\nsyms = %i[a b]",
    "percent_multiline_unbalanced": "words = %w[\n  alpha(\n  beta]\n  gamma\n]\nz = 1",
    "percent_q_sinky_body": "doc = %q{system(params[:x]) and ( unbalanced}\nz = 1",
    "percent_r_regex": "pat = %r{^/api/(v1|v2)/}\nz = 1",
    "percent_modulo_untouched": "fmt = 'x=%d'\ns = fmt % [1]\nt = 10 % 3",
    "rescue_modifier": "x = risky rescue nil",
    "lambda_arrow": "f = ->(x, y = 2) { x + y }\ng = lambda { |z| z }",
    "adjacent_heredocs": "s = <<~A + <<~B\n  first\nA\n  second\nB\nz = 1",
}


def _java(c):
    from dr_source_spark.detectors.java_taint import analyze_java

    return analyze_java(c, CKB.taint["java"])


def _js(c):
    from dr_source_spark.detectors.js_taint import analyze_js

    return analyze_js(c, CKB.taint["javascript"])


def _php(c):
    from dr_source_spark.detectors.php_taint import analyze_php

    return analyze_php(c, CKB.taint["php"])


def _ruby(c):
    from dr_source_spark.detectors.ruby_taint import analyze_ruby

    return analyze_ruby(c, CKB.taint["ruby"])


_SUITES = [
    ("java", JAVA, _J_PLANT, "executeQuery", _java),
    ("js", JS, _JS_PLANT, "eval", _js),
    ("php", PHP, _PHP_PLANT, "mysqli_query", _php),
    ("ruby", RUBY, _RB_PLANT, "system", _ruby),
]


@pytest.mark.parametrize(
    "lang,name",
    [(lang, name) for lang, cases, _p, _s, _a in _SUITES for name in cases],
)
def test_plant_survives_modern_construct(lang, name):
    cases, plant, sink, analyze = next(
        (c, p, s, a) for lg, c, p, s, a in _SUITES if lg == lang
    )
    out = analyze(cases[name] + plant)
    assert any(sink in (f.get("sink") or "") for f in out), (
        f"{lang}/{name}: construct desynced the parser — planted {sink} flow lost"
    )
    # and deterministic
    out2 = analyze(cases[name] + plant)
    key = lambda f: (f["line"], f["vuln_type"], f["message"])
    assert sorted(map(key, out)) == sorted(map(key, out2))


_FP_CASES = {
    "java_const_to_sink": ("java", 'class A { void m(java.sql.Statement st) throws Exception { String q = "SELECT 1"; st.executeQuery(q); } }'),
    "java_textblock_sink": ("java", 'class A { void m(java.sql.Statement st) throws Exception { String q = """\n SELECT 1\n """; st.executeQuery(q); } }'),
    "js_const_eval": ("js", "const code = 'safe()'; eval(code);"),
    "js_regex_not_taint": ("js", "const p = /req.query/; eval('1');"),
    "php_const": ("php", '<?php $q = "SELECT 1"; mysqli_query($c, $q); ?>'),
    "ruby_const": ("ruby", 'cmd = "ls"\nsystem(cmd)'),
    "ruby_heredoc_sink_text": ("ruby", "doc = <<~EOT\n  system(params[:x])\nEOT\nputs doc"),
    "ruby_percent_sink_text": ("ruby", "doc = %q{system(params[:x])}\nputs doc"),
    "ruby_percent_w_sink_text": ("ruby", "cmds = %w[system(params[:x]) exec(cmd)]\nputs cmds"),
}


@pytest.mark.parametrize("name", sorted(_FP_CASES))
def test_safe_flows_stay_clean(name):
    """The inverse battery: constants reaching sinks, sink-shaped text in
    string/heredoc/regex-literal positions — none may produce a taint
    finding (precision twin of the recovery probes)."""
    lang, src = _FP_CASES[name]
    analyze = {"java": _java, "js": _js, "php": _php, "ruby": _ruby}[lang]
    taint = [h for h in analyze(src) if h.get("sink")]
    assert taint == [], taint


def test_ruby_percent_literal_preserves_line_numbers():
    """A multi-line %w list must blank to its newline count so the planted
    flow below reports its TRUE source line."""
    src = "words = %w[\n  a\n  b\n  c\n]\nv = params[:cmd]\nsystem(\"go #{v}\")\n"
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert out and out[0]["line"] == 7, out


def test_ruby_unclosed_percent_literal_left_untouched():
    """An unclosed %q( — e.g. a modulo misread — must NOT swallow trailing
    code: the scan bails and the planted flow still surfaces."""
    src = "x = y %q_unclosed\nv = params[:cmd]\nsystem(\"go #{v}\")\n"
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert out, "unclosed %-literal swallowed the rest of the file"


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        ("heredoc_interp", 'cmd = <<~CMD\n  ls #{params[:x]}\nCMD\nsystem(cmd)', True),
        ("heredoc_quoted_tag", "cmd = <<~'CMD'\n  ls #{params[:x]}\nCMD\nsystem(cmd)", False),
        ("heredoc_inline_arg", 'system(<<~CMD)\n  ls #{params[:x]}\nCMD', True),
        ("pctQ_interp", 'cmd = %Q{ls #{params[:x]}}\nsystem(cmd)', True),
        ("pctq_no_interp", 'cmd = %q{ls #{params[:x]}}\nsystem(cmd)', False),
    ],
)
def test_ruby_interpolation_through_blanked_literals(name, src, tainted):
    """tree-sitter walks interpolation inside heredoc/%Q bodies; the
    blanking passes must preserve safe #{...} fragments so those taint
    flows survive — and single-quote-like forms must NOT interpolate."""
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert bool(out) == tainted, (name, out)


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        # tree-sitter heredoc nodes are NOT constant-resolvable -> existing
        # taint of interpolated vars propagates (reference
        # php/taint_visitor.py:76,151-167) ...
        ("heredoc_interp", "<?php\n$i = $_GET['x'];\n$q = <<<SQL\nSELECT $i\nSQL;\nmysqli_query($c, $q);\n?>", True),
        # ... while a double-quoted "SELECT $i" IS constant-resolved and
        # clears taint — the asymmetry is the parity point
        ("dq_interp_is_const", "<?php\n$i = $_GET['x'];\n$q = \"SELECT $i\";\nmysqli_query($c, $q);\n?>", False),
        ("nowdoc_is_const", "<?php\n$i = $_GET['x'];\n$q = <<<'SQL'\nSELECT $i\nSQL;\nmysqli_query($c, $q);\n?>", False),
        ("heredoc_no_vars", "<?php\n$q = <<<SQL\nSELECT 1\nSQL;\nmysqli_query($c, $q);\n?>", False),
        # body text shaped like a sink call must NOT false-positive
        ("heredoc_sink_text", "<?php\n$q = <<<TXT\nmysqli_query($c, $_GET['x'])\nTXT;\necho 'hi';\n?>", False),
    ],
)
def test_php_heredoc_semantics(name, src, tainted):
    out = [f for f in _php(src) if f.get("sink")]
    assert bool(out) == tainted, (name, out)


def test_php_heredoc_preserves_line_numbers():
    src = "<?php\n$d = <<<TXT\na\nb\nc\nTXT;\n$i = $_GET['x'];\nmysqli_query($c, \"SELECT \" . $i);\n?>"
    out = [f for f in _php(src) if f.get("sink")]
    assert out and out[0]["line"] == 8, out


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        # template substitutions propagate EXISTING taint (the reference's
        # collect_identifiers walks template_substitution children) ...
        ("template_two_step", "app.get('/p', (req, res) => { const u = req.query.cmd; const c = `run ${u}`; eval(c); });", True),
        ("template_sink_arg", "app.get('/p', (req, res) => { const u = req.query.cmd; eval(`run ${u}`); });", True),
        # ... but a SOURCE expression directly inside a template is NOT
        # matched (reference check_source_or_sanitizer sees no path for the
        # template node; is_tainted only consults assigned taint)
        ("template_direct_source", "app.get('/p', (req, res) => { const c = `run ${req.query.cmd}`; eval(c); });", False),
        ("template_no_subst_const", "app.get('/p', (req, res) => { const c = `run ls`; eval(c); });", False),
    ],
)
def test_js_template_literal_semantics(name, src, tainted):
    """Pins the observed reference asymmetry for template literals
    (javascript/taint_visitor.py:68-79,154-168)."""
    out = [f for f in _js(src) if f.get("sink")]
    assert bool(out) == tainted, (name, out)


def test_java_textblock_concat_propagates_taint():
    """Taint must flow through text-block + tainted concatenation (the
    text block is a constant fragment, not a taint barrier)."""
    src = (
        "class A { void m(javax.servlet.http.HttpServletRequest request,"
        " java.sql.Statement st) throws Exception {"
        ' String u = request.getParameter("q");'
        ' String q = """\n SELECT\n """ + u; st.executeQuery(q); } }'
    )
    out = [f for f in _java(src) if "executeQuery" in (f.get("sink") or "")]
    assert out, "text-block concat dropped taint"


_J_SW = (
    "class A { void m(javax.servlet.http.HttpServletRequest request,"
    ' java.sql.Statement st) throws Exception { String u = request.getParameter("q"); %s } }'
)


@pytest.mark.parametrize(
    "name,body,tainted",
    [
        ("arm_expr", 'String q = switch (1) { case 1 -> u; default -> "s"; }; st.executeQuery(q);', True),
        ("arm_const", 'String q = switch (1) { case 1 -> "a"; default -> "s"; }; st.executeQuery(q);', False),
        ("sink_in_arm", 'int r = switch (1) { case 1 -> st.executeQuery(u) != null ? 1 : 0; default -> 0; };', True),
        ("yield_block", 'String q = switch (1) { case 1 -> { yield u; } default -> { yield "s"; } }; st.executeQuery(q);', True),
        ("classic_stmt", 'switch (1) { case 1: st.executeQuery(u); break; default: break; }', True),
    ],
)
def test_java_switch_expression_taint(name, body, tainted):
    """Switch EXPRESSIONS propagate taint out of arms and expose sink calls
    inside arms (the reference's collect_identifiers walks the whole
    tree-sitter switch subtree, java/taint_visitor.py:85-89,202)."""
    out = [f for f in _java(_J_SW % body) if "executeQuery" in (f.get("sink") or "")]
    assert bool(out) == tainted, (name, out)


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        ("match_arm_taint", "<?php\n$i = $_GET['x'];\n$q = match(1) { 1 => $i, default => 'a' };\nmysqli_query($c, $q);\n?>", True),
        ("match_all_const", "<?php\n$q = match(1) { 1 => 'b', default => 'a' };\nmysqli_query($c, $q);\n?>", False),
        ("match_sink_in_arm", "<?php\n$i = $_GET['x'];\n$r = match(1) { 1 => mysqli_query($c, $i), default => 'a' };\n?>", True),
    ],
)
def test_php_match_expression_taint(name, src, tainted):
    out = [f for f in _php(src) if f.get("sink")]
    assert bool(out) == tainted, (name, out)


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        ("spread_array", "app.get('/p', (req, res) => { const c = req.query.cmd; eval(...[c]); });", True),
        ("spread_name", "app.get('/p', (req, res) => { const c = req.query.cmd; eval(...c); });", True),
        ("spread_const", "app.get('/p', (req, res) => { eval(...['safe']); });", False),
    ],
)
def test_js_spread_argument_taint(name, src, tainted):
    """The spread-ee is the argument for taint purposes (reference collects
    identifiers under the spread_element child of arguments)."""
    out = [f for f in _js(src) if f.get("sink")]
    assert bool(out) == tainted, (name, out)


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        # ADVICE r3: lowercase tags on the unambiguous forms are real Ruby
        ("squiggly_lowercase", 'cmd = <<~eos\n  ls #{params[:x]}\neos\nsystem(cmd)', True),
        ("dash_lowercase", 'cmd = <<-eot\n  ls #{params[:x]}\neot\nsystem(cmd)', True),
        ("quoted_lowercase_nowdoc", "cmd = <<~'eos'\n  ls #{params[:x]}\neos\nsystem(cmd)", False),
    ],
)
def test_ruby_lowercase_heredoc_tags(name, src, tainted):
    """<<~eos / <<-eot (lowercase tags) are unambiguous heredocs — only the
    bare <<TAG form needs the uppercase disambiguation vs shifts."""
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert bool(out) == tainted, (name, out)


def test_ruby_bare_lowercase_shift_stays_code():
    """`n <<bits` (bare lowercase, no space) is a shift, not a heredoc —
    the rest of the file must keep parsing."""
    src = "n = 1 <<bits\nv = params[:cmd]\nsystem(\"go #{v}\")\n"
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert out, "bare lowercase <<ident swallowed the file as a heredoc"


def test_ruby_string_opener_does_not_steal_placeholder():
    """An opener-shaped token inside a string literal on the same line as a
    real opener must not consume its placeholder or crash the sub."""
    src = 'x = "<<~A"\ncmd = <<~B\n  ls #{params[:x]}\nB\nsystem(cmd)\n'
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert out and out[0]["line"] == 5, out


def test_ruby_same_line_string_lookalike_keeps_real_opener():
    """ADVICE r4: a valid-form opener lookalike inside a string literal ON
    THE SAME LINE as a real opener must not consume the placeholder — the
    probe's match spans are position-aligned with the raw line, so only the
    real opener is substituted and the string survives verbatim."""
    from dr_source_spark.parsers.rubyparse import _blank_noncode

    src = 'msg = "use <<~EOS"; cmd = <<~DOC\n  ls #{params[:x]}\nDOC\nsystem(cmd)\n'
    blanked = _blank_noncode(src)
    assert '"use <<~EOS"' in blanked  # string untouched
    assert "<<~DOC" not in blanked  # real opener substituted
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert out and out[0]["line"] == 4, out


@pytest.mark.parametrize(
    "name,src,tainted",
    [
        # quoted-tag heredocs: the probe must NOT pad away the tag string —
        # before the r5 fix these bodies lexed as code (false-positive risk)
        ("squiggly_sq", "x = <<~'EOS'\n  system(params[:x])\nEOS\nputs x", False),
        ("bare_sq", "x = <<'EOS'\n  system(params[:x])\nEOS\nputs x", False),
        ("squiggly_dq_interp", 'cmd = <<~"EOS"\n  ls #{params[:x]}\nEOS\nsystem(cmd)', True),
        ("bare_dq_interp", 'cmd = <<"EOS"\n  ls #{params[:x]}\nEOS\nsystem(cmd)', True),
    ],
)
def test_ruby_quoted_tag_heredocs_blanked(name, src, tainted):
    """Quoted heredoc tags (<<~'EOS', <<"TAG") are detected by the probe;
    single-quoted tags suppress interpolation (nowdoc), double-quoted keep
    it — and sink-shaped TEXT inside any body never lexes as code."""
    out = [f for f in _ruby(src) if "system" in (f.get("sink") or "")]
    assert bool(out) == tainted, (name, out)


def test_lexer_prepasses_skip_on_probe_negative_content():
    """Per-file pre-passes must return the INPUT OBJECT (identity — proving
    the O(n) scan never ran) when a cheap substring/regex probe says the
    construct cannot occur; this is the detector stage's per-file fixed-cost
    guard on small files (round-3 regression postmortem)."""
    from dr_source_spark.parsers import phpparse, rubyparse

    rb = "v = params[:cmd]\nn = a % b\nsystem(v)\n"  # modulo, but no %-literal opener
    assert rubyparse._blank_percent_literals(rb) is rb
    assert rubyparse._blank_noncode(rb) is rb  # no '<<', no '=begin'
    php = "<?php $v = $_GET['x']; mysqli_query($c, $v); ?>"  # no '<<<'
    assert phpparse._blank_heredocs(php) is php
