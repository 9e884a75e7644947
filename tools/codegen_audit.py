"""Whole-stage-codegen fallback audit across every driver query.

Round 5 found two SILENT janino 64 KB fallbacks (parts_item_cosine since
its introduction, events_mann_kendall on first build): Spark logs
"ERROR CodeGenerator: Failed to compile" and interprets the WHOLE stage
— correctness unaffected, throughput quietly wrecked, and nothing in
pytest or the oracle harness notices. This tool closes that class: it
runs the full oracle sweep (tools/oracle_check.py) as a subprocess with
stderr merged into stdout and attributes every CodeGenerator failure to
the query in flight (failures print BEFORE the query's OK/FAIL line).

Usage: python tools/codegen_audit.py   → per-query failure counts + a
one-line verdict; exit 1 if any query triggered a fallback.
"""

import re
import subprocess
import sys

REPO = __file__.rsplit("/tools/", 1)[0]

proc = subprocess.Popen(
    [sys.executable, f"{REPO}/tools/oracle_check.py"],
    stdout=subprocess.PIPE,
    stderr=subprocess.STDOUT,
    text=True,
    cwd="/tmp",
)

pending_failures = 0
failures: dict[str, int] = {}
ok = fail = 0
for raw in proc.stdout:
    for line in raw.replace("\r", "\n").split("\n"):
        if "ERROR CodeGenerator" in line and "Failed to compile" in line:
            pending_failures += 1
        m = re.match(r"^(OK|FAIL)\s+(\S+)", line)
        if m:
            if m.group(1) == "OK":
                ok += 1
            else:
                fail += 1
            if pending_failures:
                failures[m.group(2)] = pending_failures
                pending_failures = 0
proc.wait()

for name, n in sorted(failures.items()):
    print(f"CODEGEN-FALLBACK {name}: {n} compile failure(s)")
print(
    f"codegen_audit: {ok} OK / {fail} FAIL oracle rows; "
    f"{len(failures)} queries with codegen fallbacks"
)
sys.exit(1 if failures or fail else 0)
