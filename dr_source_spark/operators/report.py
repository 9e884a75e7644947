"""Report export (SURVEY.md §2A A12): SARIF 2.1.0 / JSON / ASCII.

Driver-side shaping of a BOUNDED findings set (`limit` guards against
collecting a 100 TB run's findings onto the driver — export is for humans;
machines read the parquet/Iceberg tables). Field mapping mirrors the
reference exporters (reports/sarif.py:6-61, reports/ascii.py) with the
trace flattened `" -> "` exactly like the reference storage layer
(scanner.py:209).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import List, Optional

from pyspark.sql import DataFrame


def _collect(findings: DataFrame, limit: int) -> List[dict]:
    rows = findings.limit(limit).collect()
    return [
        {
            "file": f"{r.repo}:{r.path}@{r.commit}",
            "vuln_type": r.vuln_type,
            "match": r.message,
            "line": r.line,
            "severity": r.severity,
            "plugin_name": r.plugin,
            "trace": " -> ".join(r.trace or []),
        }
        for r in rows
    ]


def to_sarif(findings: DataFrame, limit: int = 100_000, tool_version: str = "0.1.0") -> str:
    results = _collect(findings, limit)
    now = datetime.now(timezone.utc).isoformat().replace("+00:00", "Z")
    sarif_results = [
        {
            "ruleId": r["vuln_type"],
            "level": "error",
            "message": {"text": f"Possible {r['vuln_type']} vulnerability detected."},
            "locations": [
                {
                    "physicalLocation": {
                        "artifactLocation": {"uri": r["file"], "uriBaseId": "%SRCROOT%"},
                        "region": {"startLine": r["line"], "endLine": r["line"]},
                    }
                }
            ],
            "properties": {"details": r["match"]},
        }
        for r in results
    ]
    doc = {
        "version": "2.1.0",
        "$schema": "https://json.schemastore.org/sarif-2.1.0.json",
        "runs": [
            {
                "tool": {
                    "driver": {
                        "name": "dr_source_spark",
                        "version": tool_version,
                        "rules": sorted(
                            ({"id": r["vuln_type"], "name": r["vuln_type"]} for r in results),
                            key=lambda x: x["id"],
                        ),
                    }
                },
                "invocations": [
                    {"executionSuccessful": True, "startTimeUtc": now, "endTimeUtc": now}
                ],
                "results": sarif_results,
            }
        ],
    }
    # dedupe rules list while keeping order stability
    seen = set()
    rules = []
    for r in doc["runs"][0]["tool"]["driver"]["rules"]:
        if r["id"] not in seen:
            seen.add(r["id"])
            rules.append(r)
    doc["runs"][0]["tool"]["driver"]["rules"] = rules
    return json.dumps(doc, indent=2)


def to_json(findings: DataFrame, limit: int = 100_000) -> str:
    return json.dumps(_collect(findings, limit), indent=2)


def to_ascii(findings: DataFrame, limit: int = 1000, max_width: Optional[int] = 100) -> str:
    """Plain fixed-width table (the reference uses tabulate; same shape)."""
    rows = _collect(findings, limit)
    headers = ["file", "line", "vuln_type", "severity", "match"]
    table = [[str(r[h])[:max_width] for h in headers] for r in rows]
    widths = [max(len(h), *(len(row[i]) for row in table)) if table else len(h) for i, h in enumerate(headers)]
    sep = "+".join("-" * (w + 2) for w in widths)
    lines = [sep, "|".join(f" {h.ljust(w)} " for h, w in zip(headers, widths)), sep]
    for row in table:
        lines.append("|".join(f" {c.ljust(w)} " for c, w in zip(row, widths)))
    lines.append(sep)
    return "\n".join(lines)
