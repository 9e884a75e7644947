"""Minimal Java structural parser — implemented in milestone M5."""

def extract_method_defs(content):
    return []
