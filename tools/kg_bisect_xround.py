"""Cross-round kg_extract bisect (VERDICT r4 #3): run the SAME stage-level
attribution against older engine tips checked out as git worktrees, so the
r2→r4 wall-time drift is attributed to stages with numbers.

Usage: python tools/kg_bisect_xround.py /path/to/engine/tree [runs]
(sys.path is pointed at the given tree; the tool itself lives in the
current repo so old tips don't need it.)
"""

from __future__ import annotations

import inspect
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, TREE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    # r2 predates compiled_kb_cached (memoization arrived in r3)
    try:
        from dr_source_spark.kb import compiled_kb_cached
    except ImportError:
        from dr_source_spark.kb import compile_kb, load_kb

        def compiled_kb_cached(project_dir):
            return compile_kb(load_kb(project_dir=project_dir))
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.operators.index_build import (
        build_symbol_index,
        try_broadcast_index,
    )
    from dr_source_spark.pipeline import extract
    from dr_source_spark.session import get_spark
    from dr_source_spark.sources.corpus import ingest_source_files
    from dr_source_spark.sources.synth import synth_code_corpus

    spark = get_spark(
        app_name="kg_bisect_xround",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    ckb = compiled_kb_cached(project_dir="/nonexistent")

    synth_kwargs = {}
    if "templates" in inspect.signature(synth_code_corpus).parameters:
        synth_kwargs["templates"] = 6

    def corpus():
        return synth_code_corpus(docs, **synth_kwargs)

    def stage_synth():
        return corpus().count()

    def stage_ingest():
        return ingest_source_files(corpus()).count()

    def stage_index():
        files = ingest_source_files(corpus())
        idx = build_symbol_index(files)
        bc = try_broadcast_index(spark, idx, max_entries=50_000)
        if bc is not None:
            bc.unpersist()
        return 1

    def stage_detect():
        files = ingest_source_files(corpus())
        idx = build_symbol_index(files)
        bc = try_broadcast_index(spark, idx, max_entries=50_000)
        n = run_detectors(files, ckb, fn_index_broadcast=bc).count()
        if bc is not None:
            bc.unpersist()
        return n

    ex_params = inspect.signature(extract).parameters

    def stage_full():
        kwargs = {"run_id": "bisect"} if "run_id" in ex_params else {}
        res = extract(spark, corpus(), **kwargs)
        n = res.triples.count()
        if hasattr(res, "cleanup"):
            res.cleanup()
        return n

    stages = [
        ("synth+count", stage_synth),
        ("+ingest", stage_ingest),
        ("+index_build+bcast", stage_index),
        ("+detectors", stage_detect),
        ("full_extract(triples)", stage_full),
    ]
    stage_full()  # warm

    # load-gate each stage series: these numbers feed the cross-round
    # attribution table, which is worthless at loadavg 5+
    while os.getloadavg()[0] > 2.5:
        time.sleep(10)

    best = {}
    for name, fn in stages:
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            n = fn()
            samples.append(time.monotonic() - t0)
        best[name] = min(samples)
        print(
            f"{os.path.basename(TREE):4s} {name:24s} best={min(samples):6.3f}s  "
            f"spread={(max(samples) / min(samples) - 1) * 100:5.1f}%  n={n}",
            flush=True,
        )
    prev = 0.0
    for name, _ in stages:
        print(f"{os.path.basename(TREE):4s} DELTA {name:24s} {best[name] - prev:6.3f}s")
        prev = best[name]
    print(f"loadavg={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
