"""Driver-contract invariants that round 5 depends on:

1. The driver's CORRECTNESS snapshot records only the FIRST 50
   queries() entries, so the front of the dict must hold exactly the
   queries that never had a driver row in rounds 1-4 (the round-4
   verdict's top item). New queries must be APPENDED, never inserted.
2. Every query has a full value-hash DuckDB oracle (zero rows-only
   checks since round 2).
"""

import json
import os

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rowed_before_r5() -> set:
    rowed = set()
    for r in (1, 2, 3, 4):
        path = f"{REPO}/CORRECTNESS_r0{r}.json"
        if os.path.exists(path):
            with open(path) as f:
                rowed |= set(json.load(f))
    return rowed


def test_first_fifty_are_the_never_rowed_queries():
    names = list(E.queries())
    assert len(names) >= 50
    rowed = _rowed_before_r5()
    if not rowed:  # fresh checkout without driver artifacts
        return
    offenders = [n for n in names[:50] if n in rowed]
    assert not offenders, (
        "driver window polluted by already-rowed queries (append new "
        f"queries at the END of the dict): {offenders}"
    )


def test_every_query_has_a_value_hash_oracle():
    qs, os_ = E.queries(), E.oracle_sql()
    missing = [n for n in qs if n not in os_]
    assert not missing, f"queries without oracle_sql: {missing}"
    stale = [n for n in os_ if n not in qs]
    assert not stale, f"oracle_sql entries without a query: {stale}"
