"""Checkpointed, resumable extraction with per-split lineage + metrics.

The reference has no resume story (a crashed scan just re-runs,
SURVEY.md §4 R12). At 10^12 files the job MUST be interruptible, so:

* every input row maps to a stable split: ``pmod(xxhash64(repo, path), S)``
  — content-independent, so a re-run sees identical splits;
* splits are processed in B batches; each batch appends its findings to a
  split-partitioned parquet table and THEN appends `done` lineage rows
  (write-then-commit ordering: a crash between the two re-processes the
  batch, and the overwrite of those split partitions keeps output exact);
* resume = anti-join of pending splits against `done` lineage rows —
  identical call, no special mode;
* per-batch metrics (files, findings) ride on the lineage rows; run-level
  counts come from `observe()` on the findings DataFrame.

Batch size trades checkpoint granularity against scheduling overhead: with
B=16 on a 1000-executor cluster each batch is still tens of thousands of
tasks — the barrier cost is noise, and an interruption loses at most 1/16
of the work.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class LineageRun:
    run_id: str
    findings_path: str
    lineage_path: str
    batches_run: int
    splits_done: int
    files: int
    findings: int


def _with_split(files: DataFrame, num_splits: int) -> DataFrame:
    return files.withColumn("split_key", F.pmod(F.xxhash64("repo", "path"), F.lit(num_splits)).cast("int"))


def completed_splits(spark: SparkSession, lineage_path: str, run_id: str) -> List[int]:
    try:
        lin = spark.read.parquet(lineage_path)
    except Exception:
        return []
    rows = lin.filter((F.col("run_id") == run_id) & (F.col("status") == "done")).select("split_key").distinct().collect()
    return sorted(r.split_key for r in rows)


def extract_with_lineage(
    spark: SparkSession,
    files: DataFrame,
    ckb,
    output_dir: str,
    run_id: str,
    num_splits: int = 64,
    num_batches: int = 8,
    max_batches: Optional[int] = None,
    fn_index_broadcast=None,
) -> LineageRun:
    """Run (or resume) the detector stage over ``files`` with checkpointing.

    ``max_batches`` exists for tests/controlled draining: stop after N
    batches as if interrupted. Call again with the same run_id to resume.
    """
    from .analyze import run_detectors

    findings_path = f"{output_dir}/findings"
    lineage_path = f"{output_dir}/lineage"

    files = _with_split(files, num_splits)
    done = set(completed_splits(spark, lineage_path, run_id))
    pending = [s for s in range(num_splits) if s not in done]
    per_batch = max(1, (len(pending) + num_batches - 1) // num_batches) if pending else 1

    batches_run = 0
    total_files = total_findings = 0
    for i in range(0, len(pending), per_batch):
        if max_batches is not None and batches_run >= max_batches:
            break
        batch = pending[i : i + per_batch]
        batch_files = files.filter(F.col("split_key").isin(batch))
        findings = run_detectors(batch_files, ckb, fn_index_broadcast=fn_index_broadcast)
        # recompute the split key on the narrow findings (same deterministic
        # expression) instead of joining the wide input back in
        findings = findings.withColumn(
            "split_key", F.pmod(F.xxhash64("repo", "path"), F.lit(num_splits)).cast("int")
        )
        # dynamic partition overwrite keeps re-processing idempotent;
        # partitioned by (run_id, split_key) so other runs are untouched
        (
            findings.withColumn("run_id", F.lit(run_id))
            .repartition("split_key")
            .write.partitionBy("run_id", "split_key")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(findings_path)
        )
        stats = (
            batch_files.groupBy("split_key")
            .agg(F.count("*").alias("files"))
            .collect()
        )
        f_stats = {
            r.split_key: r.cnt
            for r in spark.read.parquet(findings_path)
            .filter(F.col("split_key").isin(batch) & (F.col("run_id") == run_id))
            .groupBy("split_key")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        lineage_rows = [
            (run_id, int(s.split_key), f"split={s.split_key}", int(s.files), int(f_stats.get(s.split_key, 0)), "done", time.time())
            for s in stats
        ]
        empty_splits = [s for s in batch if s not in {x.split_key for x in stats}]
        lineage_rows += [(run_id, int(s), f"split={s}", 0, 0, "done", time.time()) for s in empty_splits]
        spark.createDataFrame(
            lineage_rows,
            "run_id string, split_key int, split_id string, files long, findings long, status string, ts double",
        ).write.mode("append").parquet(lineage_path)
        batches_run += 1
        total_files += sum(r.files for r in stats)
        total_findings += sum(f_stats.values())

    done_after = completed_splits(spark, lineage_path, run_id)
    return LineageRun(
        run_id=run_id,
        findings_path=findings_path,
        lineage_path=lineage_path,
        batches_run=batches_run,
        splits_done=len(done_after),
        files=total_files,
        findings=total_findings,
    )


def read_findings(spark: SparkSession, output_dir: str, run_id: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/findings").filter(F.col("run_id") == run_id)


def run_history(spark: SparkSession, output_dir: str) -> DataFrame:
    """A10/A8 — per-run summary over the lineage store, newest first
    (reference db.py:171-189, 253-297: scan history + per-project listing)."""
    lin = spark.read.parquet(f"{output_dir}/lineage")
    return (
        lin.groupBy("run_id")
        .agg(
            F.sum("files").cast("long").alias("num_files_analyzed"),
            F.sum("findings").cast("long").alias("num_vulnerabilities"),
            F.countDistinct("split_key").alias("splits_done"),
            F.max("ts").alias("last_update_ts"),
        )
        .orderBy(F.desc("last_update_ts"))
    )


def compare_runs(spark: SparkSession, output_dir: str, old_run: str, new_run: str) -> dict:
    """A9 — new/resolved/persistent findings between two stored runs
    (reference db.py:191-219 tuple set algebra)."""
    from .relational import scan_diff

    key = ["path", "vuln_type", "message", "line"]
    return scan_diff(
        read_findings(spark, output_dir, new_run),
        read_findings(spark, output_dir, old_run),
        key,
    )
