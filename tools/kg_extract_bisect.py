"""Stage-level bisect of the kg_extract wall-time drift (VERDICT r4 #3).

Times each pipeline stage cumulatively at sf0.1 (best-of-N on a quiet
box): corpus synth, ingest, symbol-index build+broadcast, detector pass,
triples explode, and the full extract() as bench.py times it. The deltas
between consecutive cumulative timings attribute the wall time.

Usage: python tools/kg_extract_bisect.py [runs=3] [templates=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    templates = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from dr_source_spark.kb import compiled_kb_cached
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
        app_name="kg_extract_bisect",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm the scan
    ckb = compiled_kb_cached(project_dir="/nonexistent")

    def corpus():
        return synth_code_corpus(docs, templates=templates)

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

    def stage_full():
        res = extract(spark, corpus(), run_id="bisect")
        n = res.triples.count()
        res.cleanup()
        return n

    stages = [
        ("synth+count", stage_synth),
        ("+ingest", stage_ingest),
        ("+index_build+bcast", stage_index),
        ("+detectors", stage_detect),
        ("full_extract(triples)", stage_full),
    ]
    # warm everything once (python workers, codegen, KB broadcast)
    stage_full()

    best = {}
    for name, fn in stages:
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            n = fn()
            samples.append(time.monotonic() - t0)
        best[name] = min(samples)
        print(
            f"{name:24s} best={min(samples):6.3f}s  "
            f"spread={(max(samples) / min(samples) - 1) * 100:5.1f}%  n={n}",
            flush=True,
        )
    print("-- deltas (attribution) --")
    names = [n for n, _ in stages]
    prev = 0.0
    for n in names:
        print(f"{n:24s} delta={best[n] - prev:6.3f}s")
        prev = best[n]
    print(f"loadavg={os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()
