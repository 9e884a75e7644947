"""Execute EVERY declared query at a large scale factor and record wall
time, row count, and failures — the "holds at scale" census (round 6).

The driver's correctness gate runs at sf0.01; the bench times 14 queries.
This tool closes the gap for the other ~350: each query is materialized
(count) at the given SF inside a job group with a watchdog that cancels
runaways, so one pathological query cannot wedge the sweep. Output: one
JSON line per query (diffable), then a summary with the slowest N.

Usage: python tools/scale_census.py [--sf DIR] [--timeout SEC] [--only A B ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/sf1approx"
TIMEOUT = 300.0
argv = sys.argv[1:]
if "--sf" in argv:
    SF = argv[argv.index("--sf") + 1]
if "--timeout" in argv:
    TIMEOUT = float(argv[argv.index("--timeout") + 1])
only = argv[argv.index("--only") + 1:] if "--only" in argv else None


def main() -> None:
    from dr_source_spark.session import get_spark

    import __spark_entry__ as E

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scale_census", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    sc = spark.sparkContext
    qs = E.queries()
    if only:
        qs = {k: qs[k] for k in only}
    results = []
    for i, (name, fn) in enumerate(qs.items()):
        group = f"census_{i}_{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timed_out = threading.Event()

        def cancel(g=group):
            timed_out.set()
            sc.cancelJobGroup(g)

        timer = threading.Timer(TIMEOUT, cancel)
        timer.start()
        t0 = time.monotonic()
        err = None
        try:
            n = fn(spark, SF).count()
            status, rows = "ok", n
        except Exception as ex:  # noqa: BLE001 — census must survive failures
            status = "timeout" if timed_out.is_set() else f"error:{type(ex).__name__}"
            rows = None
            err = " ".join(str(ex).split())[:300]
        finally:
            timer.cancel()
            sc.setJobGroup(None, None)
        wall = round(time.monotonic() - t0, 2)
        rec = {"query": name, "status": status, "rows": rows, "sec": wall}
        if err:
            rec["err"] = err
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ok = [r for r in results if r["status"] == "ok"]
    bad = [r for r in results if r["status"] != "ok"]
    print(f"\nSUMMARY sf={SF} queries={len(results)} ok={len(ok)} "
          f"failed={len(bad)} total_sec={round(sum(r['sec'] for r in results), 1)}")
    for r in sorted(ok, key=lambda r: -r["sec"])[:15]:
        print(f"  slow: {r['query']:36s} {r['sec']:8.2f}s rows={r['rows']}")
    for r in bad:
        print(f"  BAD: {r['query']:36s} {r['status']} after {r['sec']}s")
    spark.stop()


if __name__ == "__main__":
    main()
