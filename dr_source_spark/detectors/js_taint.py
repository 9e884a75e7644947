"""Placeholder — implemented in a later milestone."""

def analyze_js(content, specs, fn_index=None):
    return []
