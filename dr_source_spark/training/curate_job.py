"""Resumable two-stage corpus curation with per-split lineage — the
production shape of the curation pipeline at 100 TB.

Stage 1 (resumable, split-local): each split of the corpus checkpoints
its NARROW per-document artifacts — doc stats (token count, quality
reason, exact-dup fingerprint) and MinHash band signatures — partitioned
by (run_id, split_key) with a lineage row per completed split, exactly
the contract `operators.lineage.extract_with_lineage` gives the KG
extraction stage. An interrupted run resumes by skipping splits whose
lineage row says 'done'; dynamic partition overwrite keeps re-processing
idempotent.

Stage 2 (global, cheap): once every split is checkpointed, the LSH
banding → Jaccard verify → connected components → keep-list pass runs
over the NARROW signature table — the 100 TB text column is read once,
in stage 1, never again (the verify step joins token sets back only for
candidate pairs). The staged result is required — and pytest-gated — to
equal `training.curate.final_keep_list` run in one shot.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from .curate import REASON_KEPT, quality_reason_expr
from .dedup import _band_signatures, _pairs_from_band_sigs, duplicate_clusters, ngram_jaccard


@dataclass
class CurateRun:
    run_id: str
    stats_path: str
    sigs_path: str
    lineage_path: str
    batches_run: int
    splits_done: int
    docs: int


def _with_split(documents: DataFrame, num_splits: int) -> DataFrame:
    return documents.withColumn(
        "split_key", F.pmod(F.xxhash64("doc_id"), F.lit(num_splits)).cast("int")
    )


def _completed(spark: SparkSession, lineage_path: str, run_id: str) -> list[int]:
    try:
        lin = spark.read.parquet(lineage_path)
    except AnalysisException as e:
        # Only a missing lineage table means "fresh run". Any OTHER read
        # failure (permissions, corrupt footer, transient storage) must
        # propagate — swallowing it would silently re-process every split
        # of the corpus and misreport splits_done.
        if "PATH_NOT_FOUND" in str(getattr(e, "errorClass", "") or "") or (
            "Path does not exist" in str(e)
        ):
            return []
        raise
    rows = (
        lin.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("split_key").distinct().collect()
    )
    return sorted(r.split_key for r in rows)


def curate_stage1_with_lineage(
    spark: SparkSession,
    documents: DataFrame,
    output_dir: str,
    run_id: str,
    num_splits: int = 64,
    num_batches: int = 8,
    max_batches: int | None = None,
    num_hashes: int = 112,
    bands: int = 14,
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.05,
) -> CurateRun:
    """Run (or resume) the per-document artifact stage with checkpointing.

    ``max_batches`` exists for tests/controlled draining: stop after N
    batches as if interrupted; call again with the same run_id to resume.
    Each split writes two narrow tables partitioned by (run_id,
    split_key): ``doc_stats`` (doc_id, lang, n_tokens, fp, quality_reason)
    and ``signatures`` (doc_id, band, band_sig)."""
    stats_path = f"{output_dir}/doc_stats"
    sigs_path = f"{output_dir}/signatures"
    lineage_path = f"{output_dir}/lineage"

    docs = _with_split(documents, num_splits)
    done = set(_completed(spark, lineage_path, run_id))
    pending = [s for s in range(num_splits) if s not in done]
    per_batch = max(1, (len(pending) + num_batches - 1) // num_batches) if pending else 1

    txt = F.coalesce(F.col("text"), F.lit(""))
    norm = F.regexp_replace(F.lower(txt), r"\s+", " ")
    toks = F.filter(F.split(F.trim(F.lower(txt)), r"\s+"), lambda w: w != "")

    batches_run = 0
    total_docs = 0
    for i in range(0, len(pending), per_batch):
        if max_batches is not None and batches_run >= max_batches:
            break
        batch = pending[i : i + per_batch]
        bdocs = docs.filter(F.col("split_key").isin(batch))
        stats = bdocs.select(
            "doc_id",
            "lang",
            F.size(toks).cast("long").alias("n_tokens"),
            F.sha2(norm, 256).alias("fp"),
            quality_reason_expr(F.col("text"), min_tokens, min_stopword_ratio).alias(
                "quality_reason"
            ),
            "split_key",
        )
        sigs = _band_signatures(bdocs, num_hashes, bands).withColumn(
            "split_key", F.pmod(F.xxhash64("doc_id"), F.lit(num_splits)).cast("int")
        )
        for df, path in ((stats, stats_path), (sigs, sigs_path)):
            (
                df.withColumn("run_id", F.lit(run_id))
                .repartition("split_key")
                .write.partitionBy("run_id", "split_key")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(path)
            )
        counts = bdocs.groupBy("split_key").agg(F.count("*").alias("docs")).collect()
        rows = [
            (run_id, int(r.split_key), f"split={r.split_key}", int(r.docs), "done", time.time())
            for r in counts
        ]
        empty = [s for s in batch if s not in {r.split_key for r in counts}]
        rows += [(run_id, int(s), f"split={s}", 0, "done", time.time()) for s in empty]
        spark.createDataFrame(
            rows, "run_id string, split_key int, split_id string, docs long, status string, ts double"
        ).write.mode("append").parquet(lineage_path)
        batches_run += 1
        total_docs += sum(r.docs for r in counts)

    return CurateRun(
        run_id=run_id,
        stats_path=stats_path,
        sigs_path=sigs_path,
        lineage_path=lineage_path,
        batches_run=batches_run,
        splits_done=len(_completed(spark, lineage_path, run_id)),
        docs=total_docs,
    )


def curate_finalize(
    spark: SparkSession,
    documents: DataFrame,
    output_dir: str,
    run_id: str,
    jaccard_threshold: float = 0.9,
    max_cluster: int = 1000,
) -> DataFrame:
    """Stage 2: keep-list from the checkpointed artifacts. Reads the
    NARROW signature table for pair generation (grouped banding with the
    viral-cluster cap — same machinery as the one-shot operator), joins
    token sets back ONLY for candidates, clusters, and layers the
    checkpointed quality reasons. Writes ``keep_list`` partitioned by
    run_id and returns it.

    Output is row-identical to ``training.curate.final_keep_list``
    (pytest parity gate): near_duplicate > too_short > low_stopword_ratio
    > kept.

    Refuses to run on an incomplete stage 1: the checkpointed doc_stats
    must cover the input documents row-for-row (one metadata-cheap count
    on each side), otherwise documents from unprocessed splits would be
    dropped by the inner join below and escape curation UNAUDITED — the
    exact failure the keep-list's every-doc-gets-a-verdict invariant
    exists to prevent."""
    stats = (
        spark.read.parquet(f"{output_dir}/doc_stats")
        .filter(F.col("run_id") == run_id)
        .select("doc_id", "quality_reason")
    )
    n_docs, n_stats = documents.count(), stats.count()
    if n_docs != n_stats:
        done = _completed(spark, f"{output_dir}/lineage", run_id)
        raise ValueError(
            f"curate_finalize: stage 1 incomplete for run {run_id!r} — "
            f"{n_stats} checkpointed doc_stats rows vs {n_docs} input "
            f"documents (lineage reports {len(done)} splits done). Resume "
            f"curate_stage1_with_lineage to completion first."
        )
    sigs = (
        spark.read.parquet(f"{output_dir}/signatures")
        .filter(F.col("run_id") == run_id)
        .select("doc_id", "band", "band_sig")
    )
    cands = _pairs_from_band_sigs(sigs, max_cluster)
    verified = ngram_jaccard(documents, cands).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    clusters = duplicate_clusters(documents, pairs=verified)
    reason = F.when(
        F.col("cluster_id") != F.col("doc_id"), F.lit("near_duplicate")
    ).otherwise(F.col("quality_reason"))
    keep = (
        clusters.join(stats, "doc_id")
        .select(
            "doc_id",
            reason.alias("reason"),
            (reason == REASON_KEPT).alias("keep"),
        )
    )
    (
        keep.withColumn("run_id", F.lit(run_id))
        .write.partitionBy("run_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(f"{output_dir}/keep_list")
    )
    return spark.read.parquet(f"{output_dir}/keep_list").filter(
        F.col("run_id") == run_id
    ).select("doc_id", "reason", "keep")
