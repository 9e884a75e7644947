"""Placeholder — implemented in a later milestone."""

def analyze_java(content, specs, fn_index=None):
    return []
