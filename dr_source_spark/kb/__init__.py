from .loader import KnowledgeBase, deep_merge_config, load_kb
from .compile import CompiledKB, compile_kb, compiled_kb_cached, kb_rules_df

__all__ = [
    "KnowledgeBase", "deep_merge_config", "load_kb",
    "CompiledKB", "compile_kb", "compiled_kb_cached", "kb_rules_df",
]
