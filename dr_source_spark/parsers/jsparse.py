"""Minimal JS structural parser — implemented in milestone M5."""

def extract_function_defs(content):
    return []
