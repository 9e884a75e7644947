"""Focused detector_scan micro-bench for the regression bisect.

Runs the fused detector stage alone on the pinned 6-template sf0.1 corpus
(best-of-N after a warmup pass), prints one JSON line with timing + loadavg.
Usage: python tools/detector_bench.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from dr_source_spark.session import get_spark
    from dr_source_spark.kb import compiled_kb_cached
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.sources.corpus import ingest_source_files
    from dr_source_spark.sources.synth import synth_code_corpus

    spark = get_spark(app_name="detector_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = synth_code_corpus(docs, templates=6)
    ckb = compiled_kb_cached(project_dir="/nonexistent")
    files = ingest_source_files(corpus)

    def one():
        return run_detectors(files, ckb).count()

    n = one()  # warmup: worker spawn, codegen, per-worker memos
    load0 = [round(x, 2) for x in os.getloadavg()]
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        one()
        samples.append(round(time.monotonic() - t0, 3))
    n_files = docs.count()
    best = min(samples)
    print(json.dumps({
        "detector_scan_best": best,
        "samples": samples,
        "files_per_sec": round(n_files / best, 1),
        "findings": n,
        "files": n_files,
        "loadavg_start": load0,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
