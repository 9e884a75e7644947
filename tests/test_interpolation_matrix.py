"""Systematic PHP/JS string-interpolation parity matrix (VERDICT r3 #5).

Every cell is (quote form × source position × concatenation) and its
expected finding presence is DERIVED FROM THE REFERENCE VISITOR CODE, not
guessed — the reference's tree-sitter tiers cannot run in this sandbox, so
these goldens pin the visitors' published logic:

* PHP `_resolve_value` treats string/integer/encapsed_string as CONSTANTS
  (clearing taint) — so ANY quoted literal, even ``"SELECT $i"`` with a
  tainted ``$i`` interpolated, resolves constant and never taints
  (/root/reference/dr_source/plugins/php/taint_visitor.py:76-80,160-163);
  heredocs are NOT in that list, so their interpolated identifiers
  propagate EXISTING taint (ibid:165-168 via collect_identifiers).
* A sink argument that `_resolve_value`s to a constant is skipped before
  any identifier walk (php/taint_visitor.py:185) — the "literal-arg skip".
* JS `_resolve_value` folds ``'a' + 'b'`` (both sides resolvable) into a
  constant; a binary with ONE unresolvable side is merely "not constant"
  (javascript/taint_visitor.py:68-79).
* Propagation consults `is_tainted` — the SCOPE — only
  (php:163-168/185-188, js:162-166/179-183). A source expression written
  directly inside a binary/template/sink argument therefore does NOT taint
  in the AST tier; sources only register when they are the ENTIRE
  right-hand side of an assignment (`check_source_or_sanitizer` on the
  whole value node, php:151-157, js:154-160). The regex tier is the
  reference's catch-all for those direct-use shapes.
* Augmented assignment (``$q .= …`` / ``q += …``) is NOT an
  assignment_expression/variable_declarator node, so the reference visitor
  ignores it entirely: the LHS keeps its previous taint/constant state —
  neither propagation nor clearing happens
  (php/taint_visitor.py:121-125, javascript/taint_visitor.py:120-125).
"""

from __future__ import annotations

import pytest

from dr_source_spark.kb import compiled_kb_cached

CKB = compiled_kb_cached(project_dir="/nonexistent")


def _js(c):
    from dr_source_spark.detectors.js_taint import analyze_js

    return analyze_js(c, CKB.taint["javascript"])


def _php(c):
    from dr_source_spark.detectors.php_taint import analyze_php

    return analyze_php(c, CKB.taint["php"])

# (cell, source, expect_finding)
_PHP_MATRIX = [
    # -- assignment position: quoted forms are constants, heredoc is not --
    ("dq_interp_var", "<?php\n$i = $_GET['x'];\n$q = \"SELECT $i\";\nmysqli_query($c, $q);\n?>", False),
    ("dq_brace_interp", "<?php\n$i = $_GET['x'];\n$q = \"SELECT {$i}\";\nmysqli_query($c, $q);\n?>", False),
    ("sq_literal", "<?php\n$i = $_GET['x'];\n$q = 'SELECT $i';\nmysqli_query($c, $q);\n?>", False),
    ("heredoc_assign", "<?php\n$i = $_GET['x'];\n$q = <<<SQL\nSELECT $i\nSQL;\nmysqli_query($c, $q);\n?>", True),
    ("nowdoc_assign", "<?php\n$i = $_GET['x'];\n$q = <<<'SQL'\nSELECT $i\nSQL;\nmysqli_query($c, $q);\n?>", False),
    # -- concatenation: binary is never constant in PHP, so existing taint flows --
    ("sq_concat", "<?php\n$i = $_GET['x'];\n$q = 'SELECT ' . $i;\nmysqli_query($c, $q);\n?>", True),
    ("dq_concat", "<?php\n$i = $_GET['x'];\n$q = \"SELECT \" . $i;\nmysqli_query($c, $q);\n?>", True),
    ("chain_concat_mid", "<?php\n$i = $_GET['x'];\n$q = 'a' . $i . 'b';\nmysqli_query($c, $q);\n?>", True),
    ("concat_all_const", "<?php\n$q = 'SELECT ' . '1';\nmysqli_query($c, $q);\n?>", False),
    ("heredoc_concat_var", "<?php\n$i = $_GET['x'];\n$q = <<<SQL\nSELECT\nSQL . $i;\nmysqli_query($c, $q);\n?>", True),
    # -- sink-argument position: literal-arg skip vs identifier walk --
    ("sink_direct_dq", "<?php\n$i = $_GET['x'];\nmysqli_query($c, \"SELECT $i\");\n?>", False),
    ("sink_direct_concat", "<?php\n$i = $_GET['x'];\nmysqli_query($c, 'SELECT ' . $i);\n?>", True),
    ("sink_direct_heredoc", "<?php\n$i = $_GET['x'];\nmysqli_query($c, <<<SQL\nSELECT $i\nSQL);\n?>", True),
    # -- direct source position: sources register only as a whole RHS --
    ("direct_src_in_concat", "<?php\n$q = 'SELECT ' . $_GET['x'];\nmysqli_query($c, $q);\n?>", False),
    ("direct_src_at_sink", "<?php\nmysqli_query($c, $_GET['x']);\n?>", False),
    # -- reassignment & augmented assignment --
    ("reassign_const_clears", "<?php\n$q = $_GET['x'];\n$q = 'safe';\nmysqli_query($c, $q);\n?>", False),
    ("reassign_taints", "<?php\n$q = 'safe';\n$q = $_GET['x'];\nmysqli_query($c, $q);\n?>", True),
    ("augment_keeps_taint", "<?php\n$q = $_GET['x'];\n$q .= ' tail';\nmysqli_query($c, $q);\n?>", True),
    ("augment_no_propagate", "<?php\n$q = 'head';\n$q .= $_GET['x'];\nmysqli_query($c, $q);\n?>", False),
    # -- property taint through an encapsed literal stays constant --
    ("prop_taint_encapsed", "<?php\n$o->f = $_GET['x'];\n$q = \"SELECT {$o->f}\";\nmysqli_query($c, $q);\n?>", False),
]

_JS_MATRIX = [
    # -- concatenation: + folds only when BOTH sides resolve --
    ("concat_const_taint", "const c = req.query.x;\nconst q = 'a' + c;\neval(q);", True),
    ("chain_concat_mid", "const c = req.query.x;\nconst q = 'a' + c + 'b';\neval(q);", True),
    ("concat_all_const", "const q = 'a' + 'b';\neval(q);", False),
    # -- template literals: existing taint propagates, direct source does not --
    ("tpl_existing_taint", "const c = req.query.x;\nconst q = `ls ${c}`;\neval(q);", True),
    ("tpl_nested_concat", "const c = req.query.x;\nconst q = `a ${'b' + c}`;\neval(q);", True),
    ("tpl_direct_source", "const q = `ls ${req.query.x}`;\neval(q);", False),
    ("tpl_const_sub", "const q = `ls ${'safe'}`;\neval(q);", False),
    ("tpl_only_const", "const q = `safe`;\neval(q);", False),
    ("tainted_base_member", "const o = req.query;\nconst q = `${o.x}`;\neval(q);", True),
    # -- sink-argument position --
    ("sink_direct_concat", "const c = req.query.x;\neval('a' + c);", True),
    ("sink_const_concat", "eval('a' + 'b');", False),
    # -- direct source position (scope-only propagation) --
    ("direct_src_in_concat", "var q = 'a' + req.query.x;\neval(q);", False),
    ("direct_src_at_sink", "eval(req.query.x);", False),
    # -- declarator forms & reassignment & augmented --
    ("let_decl_taint", "let q = req.query.x;\neval(q);", True),
    ("reassign_const_clears", "let q = req.query.x;\nq = 'safe';\neval(q);", False),
    ("augment_keeps_taint", "let q = req.query.x;\nq += ' tail';\neval(q);", True),
    ("augment_no_propagate", "let q = 'head';\nq += req.query.x;\neval(q);", False),
]


@pytest.mark.parametrize("name,src,expected", _PHP_MATRIX, ids=[c[0] for c in _PHP_MATRIX])
def test_php_interpolation_matrix(name, src, expected):
    hits = [f for f in _php(src) if f.get("sink")]
    assert bool(hits) == expected, (name, hits)


@pytest.mark.parametrize("name,src,expected", _JS_MATRIX, ids=[c[0] for c in _JS_MATRIX])
def test_js_interpolation_matrix(name, src, expected):
    hits = [f for f in _js(src) if f.get("sink")]
    assert bool(hits) == expected, (name, hits)
