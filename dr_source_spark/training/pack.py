"""Sequence packing — the concat-and-chunk step between curation and
tokenization in a pretraining pipeline (GPT-style: all documents are
concatenated in a canonical order and split into fixed-length training
sequences; a document may span sequence boundaries, a sequence usually
holds several documents' slices, and the attention mask needs to know
which slice came from which document).

This emits the PLAN: one row per (document × sequence) overlap with the
token offsets of the slice, from which a tokenizer stage can assemble the
actual sequences. Pure integer arithmetic over per-document token counts;
the text column never leaves the first projection.

Scale shape: the global token offset of each document is a prefix sum in
doc_id order — computed by operators/prefix.global_prefix_sum (bucketed
two-level decomposition), NOT a ``sum() OVER (ORDER BY doc_id)`` window,
which would funnel the whole corpus through one task. The explode is a
per-row ``sequence()`` over the handful of training sequences a document
touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.prefix import global_prefix_sum


def pack_sequences(documents: DataFrame, seq_tokens: int = 128) -> DataFrame:
    """→ (doc_id, seq_id, doc_tok_start, seq_tok_start, n_toks), one row
    per (document, training sequence) overlap, all BIGINT, deterministic
    in doc_id order.

    * ``seq_id`` — 0-based training sequence index over the concatenated
      token stream;
    * ``doc_tok_start`` — offset of the slice inside the document;
    * ``seq_tok_start`` — offset of the slice inside the sequence;
    * ``n_toks`` — slice length (> 0).

    Token definition matches chunk_plan (``\\w+`` matches, NULL text = 0
    tokens). Zero-token documents occupy no tokens in the stream and emit
    no rows (they are a curation concern — text_curation_decisions flags
    them — not a packing concern).
    """
    if seq_tokens <= 0:
        raise ValueError("seq_tokens must be > 0")
    n_tok = F.coalesce(
        F.regexp_count(F.col("text"), F.lit(r"\w+")).cast("long"), F.lit(0)
    )
    narrow = (
        documents.select("doc_id", n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    c = global_prefix_sum(narrow, "doc_id", "n_tokens", out_col="_start")
    end = F.col("_start") + F.col("n_tokens")
    first_seq = F.expr(f"_start div {seq_tokens}")
    c = c.withColumn(
        "seq_id",
        F.explode(F.sequence(first_seq, F.expr(f"(_start + n_tokens - 1) div {seq_tokens}"))),
    )
    seq_lo = F.col("seq_id") * seq_tokens
    slice_start = F.greatest(F.col("_start"), seq_lo)
    slice_end = F.least(end, seq_lo + seq_tokens)
    return c.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        (slice_start - F.col("_start")).cast("long").alias("doc_tok_start"),
        (slice_start - seq_lo).cast("long").alias("seq_tok_start"),
        (slice_end - slice_start).cast("long").alias("n_toks"),
    )


def shard_plan(
    documents: DataFrame,
    keep: DataFrame,
    shard_tokens: int = 4096,
) -> DataFrame:
    """Output sharding for the curated corpus: KEPT documents (rows of
    ``keep`` with keep = true, from curate.final_keep_list) are packed
    into shards of ~``shard_tokens`` tokens in doc_id order — documents
    never split; a shard closes when the next doc would START past the
    budget boundary, so shard_id = floor(exclusive-prefix / budget) and
    a shard may overrun by at most one document (the standard
    size-balanced greedy writers use). Returns (doc_id, shard_id,
    shard_tok_offset, n_tokens).

    Composes three verified pipelines: the keep verdict, the \\w+ token
    count (chunk_plan's definition), and the distributed prefix sum —
    the whole plan inherits their scale shapes (no single-partition
    exchange over the data)."""
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be > 0")
    n_tok = F.coalesce(
        F.regexp_count(F.col("text"), F.lit(r"\w+")).cast("long"), F.lit(0)
    )
    kept = (
        documents.select("doc_id", n_tok.alias("n_tokens"))
        .join(keep.filter(F.col("keep")).select("doc_id"), "doc_id")
        .filter(F.col("n_tokens") > 0)
    )
    c = global_prefix_sum(kept, "doc_id", "n_tokens", out_col="_start")
    return c.select(
        "doc_id",
        F.expr(f"_start div {shard_tokens}").cast("long").alias("shard_id"),
        F.expr(f"_start % {shard_tokens}").cast("long").alias("shard_tok_offset"),
        "n_tokens",
    )
