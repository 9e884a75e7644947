"""Property tests: the structural parsers and detector entry points must
never raise on arbitrary input (the analyze stage treats per-file failures
as reference-compatible silent skips, but the parsers themselves promise
tolerance — a crash inside an executor batch would cost the whole task)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dr_source_spark.kb import compile_kb, load_kb

_CKB = compile_kb(load_kb(project_dir="/nonexistent"))

# code-ish fragments: heavy on the delimiters/digraphs that drive the parsers
_FRAGMENTS = list("abcdefXYZ_09 \t\n(){}[]<>.,;:=+-*/\\'\"`$#@!?%&|^~") + [
    "->", "=>", "==", "#{", "${", "/*", "*/", "//", "<?php", "def ", "end", "class ", "function ",
]
code_text = st.lists(st.sampled_from(_FRAGMENTS), max_size=200).map("".join)


@settings(max_examples=150, deadline=None)
@given(code_text)
def test_java_engine_never_raises(src):
    from dr_source_spark.detectors.java_taint import analyze_java

    assert isinstance(analyze_java(src, _CKB.taint["java"]), list)


@settings(max_examples=150, deadline=None)
@given(code_text)
def test_js_engine_never_raises(src):
    from dr_source_spark.detectors.js_taint import analyze_js

    assert isinstance(analyze_js(src, _CKB.taint["javascript"]), list)


@settings(max_examples=150, deadline=None)
@given(code_text)
def test_php_engine_never_raises(src):
    from dr_source_spark.detectors.php_taint import analyze_php

    assert isinstance(analyze_php(src, _CKB.taint["php"]), list)


@settings(max_examples=150, deadline=None)
@given(code_text)
def test_ruby_engine_never_raises(src):
    from dr_source_spark.detectors.ruby_taint import analyze_ruby

    assert isinstance(analyze_ruby(src, _CKB.taint["ruby"]), list)


@settings(max_examples=100, deadline=None)
@given(code_text)
def test_python_and_pattern_never_raise(src):
    from dr_source_spark.detectors.pattern_match import analyze_pattern
    from dr_source_spark.detectors.python_taint import analyze_python

    assert isinstance(analyze_python(src, _CKB.taint["python"]), list)
    assert isinstance(analyze_pattern(src, ".py", _CKB), list)
    assert isinstance(analyze_pattern(src, ".rb", _CKB), list)


@settings(max_examples=100, deadline=None)
@given(code_text)
def test_regex_tier_never_raises(src):
    from dr_source_spark.detectors.regex_scan import analyze_regex

    assert isinstance(analyze_regex(src, ".java", _CKB), list)
