"""Placeholder — implemented in a later milestone."""

def analyze_php(content, specs, fn_index=None):
    return []
