"""Placeholder — implemented in a later milestone."""

def analyze_ruby(content, specs, fn_index=None):
    return []
