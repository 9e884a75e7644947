"""Registry-wide physical-plan audit (round 6, guide §1.3).

For EVERY query in __spark_entry__.queries(): capture the formatted plan
and flag the scale anti-patterns the optimization guide names —
row-at-a-time Python UDFs (BatchEvalPython / ArrowEvalPython),
CartesianProduct, BroadcastNestedLoopJoin — plus the Exchange count and
whether a parquet scan carries pushed filters. PythonMapInArrow /
MapInPandas nodes are the *designed* Arrow-batch boundary of the detector /
multimodal operators and are counted separately, not flagged.

Some query builders execute bounded driver-path jobs while constructing
their result (graph escape hatches); the audit therefore runs against the
smallest SF. Output: one line per query + a summary, written to stdout
(redirect into BENCH/plan_audit_r06.txt).

Usage: python tools/plan_audit.py [--sf DIR]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]

BAD = ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin")
ARROW_OK = ("PythonMapInArrow", "MapInPandas", "FlatMapGroupsInPandas")


def main() -> None:
    from dr_source_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="plan_audit", master="local[8]", shuffle_partitions=8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = E.queries()
    flags: dict[str, list[str]] = {}
    t_start = time.monotonic()
    for name, fn in qs.items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001 — audit must not die mid-sweep
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
            flags.setdefault("__errors__", []).append(name)
            continue
        bad = [b for b in BAD if b in plan]
        n_ex = plan.count("Exchange")
        arrow = sum(plan.count(a) for a in ARROW_OK)
        scans = plan.count("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        line = (
            f"{name:36s} exchanges={n_ex:2d} scans={scans} pushed_filter_scans={pushed} "
            f"arrow_batch_nodes={arrow}"
        )
        if bad:
            line += f"  FLAG: {','.join(bad)}"
            for b in bad:
                flags.setdefault(b, []).append(name)
        print(line, flush=True)
    print()
    print(f"queries audited: {len(qs)}  wall: {round(time.monotonic() - t_start, 1)}s")
    if flags:
        for k, v in flags.items():
            print(f"{k}: {len(v)} -> {', '.join(v)}")
    else:
        print("no anti-pattern flags: 0 BatchEvalPython, 0 ArrowEvalPython, "
              "0 CartesianProduct, 0 BroadcastNestedLoopJoin across the registry")
    spark.stop()


if __name__ == "__main__":
    main()
