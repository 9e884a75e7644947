"""User-configurable knowledge-base loading with layered merge.

Reproduces the reference's 4-layer overlay semantics (factory default →
user config dir → project-local ``.dr_source_rules.yaml`` → explicit path;
reference core/knowledge_base.py:21-55) and its merge algebra (dicts
recurse, lists extend preserving target order, scalars: source wins;
reference core/utils.py:34-69, tested in reference
tests/core/test_knowledge_base_merge.py).

The factory default ships as Python data (``default_rules.py``) so executors
never touch the filesystem; user layers are YAML read once on the driver and
the merged result is broadcast.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

from .default_rules import DEFAULT_RULES


def deep_merge_config(target: Dict[str, Any], source: Dict[str, Any]) -> Dict[str, Any]:
    """Cascading config merge: higher-priority ``source`` into ``target``.

    dict+dict → recurse; list+list → target.extend(source); anything else →
    source wins. Mutates and returns ``target`` (same contract as the
    reference implementation so the merge-precedence tests port 1:1).
    """
    for key, src_val in source.items():
        tgt_val = target.get(key)
        if key in target and isinstance(tgt_val, dict) and isinstance(src_val, dict):
            target[key] = deep_merge_config(tgt_val, src_val)
        elif key in target and isinstance(tgt_val, list) and isinstance(src_val, list):
            tgt_val.extend(src_val)
        else:
            target[key] = src_val
    return target


class KnowledgeBase:
    """Merged rule catalog + the accessor surface the detector tiers use."""

    def __init__(self, rules: Dict[str, Any]):
        self.rules = rules

    # -- accessors (same shapes the reference exposes, knowledge_base.py:98-143)

    def detector_rules(self, vuln_type: str) -> Dict[str, Any]:
        return self.rules.get(vuln_type, {})

    def general_regex(self, vuln_type: str) -> List[Dict[str, Any]]:
        return self.detector_rules(vuln_type).get("general_regex_patterns", [])

    def _lang_rules(self, vuln_type: str, lang: str) -> Dict[str, Any]:
        return self.detector_rules(vuln_type).get("language_specific", {}).get(lang, {})

    def lang_regex(self, vuln_type: str, lang: str) -> List[Dict[str, Any]]:
        return self._lang_rules(vuln_type, lang).get("regex_patterns", [])

    def ast_sources(self, vuln_type: str, lang: str) -> List[str]:
        return self._lang_rules(vuln_type, lang).get("ast_sources", [])

    def ast_sinks(self, vuln_type: str, lang: str) -> List[Any]:
        return self._lang_rules(vuln_type, lang).get("ast_sinks", [])

    def ast_sanitizers(self, vuln_type: str, lang: str) -> List[str]:
        return self._lang_rules(vuln_type, lang).get("ast_sanitizers", [])

    def patterns_logic(self, vuln_type: str, lang: str) -> Dict[str, Any]:
        lang_rules = self._lang_rules(vuln_type, lang)
        return {k: lang_rules[k] for k in ("patterns", "pattern-either", "pattern-not", "pattern") if k in lang_rules}

    def vuln_types(self) -> List[str]:
        return list(self.rules.keys())

    def severity(self, vuln_type: str) -> str:
        return str(self.detector_rules(vuln_type).get("severity", "MEDIUM")).upper()

    def cwe(self, vuln_type: str) -> Optional[str]:
        return self.detector_rules(vuln_type).get("cwe")


def overlay_paths(
    explicit_path: Optional[str] = None,
    user_config_dir: Optional[str] = None,
    project_dir: Optional[str] = None,
) -> List[str]:
    """The YAML overlay candidates in priority order (lowest→highest)."""
    paths: List[str] = []
    if user_config_dir:
        paths.append(os.path.join(user_config_dir, "knowledge_base.yaml"))
    paths.append(os.path.join(project_dir or os.getcwd(), ".dr_source_rules.yaml"))
    if explicit_path:
        paths.append(explicit_path)
    return paths


def load_kb(
    explicit_path: Optional[str] = None,
    user_config_dir: Optional[str] = None,
    project_dir: Optional[str] = None,
) -> KnowledgeBase:
    """Layered load: factory default, then each existing YAML overlay in
    priority order (lowest→highest), merged with :func:`deep_merge_config`."""
    rules: Dict[str, Any] = copy.deepcopy(DEFAULT_RULES)

    for path in overlay_paths(explicit_path, user_config_dir, project_dir):
        if not path or not os.path.exists(path):
            continue
        import yaml  # driver-only dependency

        with open(path, "r") as f:
            overlay = yaml.safe_load(f)
        if overlay:
            rules = deep_merge_config(rules, overlay)
    return KnowledgeBase(rules)
