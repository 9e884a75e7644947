"""spark-submit entry point for the resumable corpus-curation pipeline.

    spark-submit --py-files dr_source_spark.zip jobs/curate.py \
        --input  <parquet path of documents (doc_id, text, lang, ...)> \
        --output <output dir> \
        [--run-id <id>] [--splits 512] [--batches 16] \
        [--jaccard 0.9] [--min-tokens 5]

Stage 1 (per-doc stats + MinHash band signatures) checkpoints per split
with lineage; re-running with the same --run-id and --output skips
completed splits. Stage 2 (LSH -> verify -> clusters -> keep list) runs
over the narrow checkpointed signatures once every split is done.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="curate-0")
    ap.add_argument("--splits", type=int, default=512)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--jaccard", type=float, default=0.9)
    ap.add_argument("--min-tokens", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from dr_source_spark.training.curate_job import (
        curate_finalize,
        curate_stage1_with_lineage,
    )

    spark = SparkSession.builder.appName("dr_source_spark_curate").getOrCreate()
    documents = spark.read.parquet(args.input)

    run = curate_stage1_with_lineage(
        spark, documents, args.output, args.run_id,
        num_splits=args.splits, num_batches=args.batches,
        min_tokens=args.min_tokens,
    )
    keep = curate_finalize(
        spark, documents, args.output, args.run_id, jaccard_threshold=args.jaccard
    )
    kept = keep.filter("keep").count()
    total = keep.count()
    print(
        f"run={run.run_id} splits_done={run.splits_done} docs={run.docs} "
        f"keep_list={total} kept={kept}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
