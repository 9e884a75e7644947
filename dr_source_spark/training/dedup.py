"""Deduplication operators for training corpora.

* exact: hash-groupBy on a content fingerprint (one shuffle of narrow cols).
* minhash (word-set Jaccard): portable md5-based hash family so the oracle
  can reproduce signatures in ANSI SQL; LSH banding turns signature equality
  into an equi-join — the scale path (no O(n²) pair comparison).
* simhash: 64-bit near-dup signature over word hashes.

Scale: every stage is groupBy/join on narrow keys; the text column is
dropped before any shuffle. Skew (a viral duplicate cluster) is bounded by
AQE skew-join splitting; cluster sizes can also be capped with a salted
two-phase count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) texts: canonical id = min doc_id."""
    return (
        fingerprint(documents)
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def _words(col="text"):
    return F.array_distinct(F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda w: w != ""))


def minhash_signatures(documents: DataFrame, num_hashes: int = 8) -> DataFrame:
    """Long-format MinHash signatures: (doc_id, seed, minhash).

    Hash family: md5(seed || ':' || word) — portable across engines (the
    DuckDB oracle computes the identical signature), uniform enough for
    Jaccard estimation. min() over hex strings = min over the hash family.

    Plan shape: repartition the (narrow) doc rows first — a small corpus
    often arrives as one parquet split and the md5 work would otherwise run
    in a single task; all k mins are computed in ONE aggregate pass (k
    expressions, no seed explode) and unpivoted with stack().
    """
    sc = documents.sparkSession.sparkContext
    words = (
        documents.repartition(sc.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(_words()).alias("word"))
    )
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("word")))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    per_doc = words.groupBy("doc_id").agg(*aggs)
    stack_expr = "stack({n}, {cols}) as (seed, minhash)".format(
        n=num_hashes, cols=", ".join(f"CAST({i} AS INT), m{i}" for i in range(num_hashes))
    )
    return per_doc.select("doc_id", F.expr(stack_expr))


def minhash_lsh_candidates(documents: DataFrame, num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate pairs.
    Returns (doc_a, doc_b) with doc_a < doc_b. Join is equi on (band,
    band_sig) — broadcast-free, shuffle on narrow keys only."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes).withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    band_sigs = (
        sigs.groupBy("doc_id", "band")
        .agg(F.concat_ws("|", F.sort_array(F.collect_list(F.concat_ws(":", "seed", "minhash")))).alias("band_sig"))
    )
    left = band_sigs.alias("l")
    right = band_sigs.alias("r")
    pairs = (
        left.join(right, (F.col("l.band") == F.col("r.band")) & (F.col("l.band_sig") == F.col("r.band_sig")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(documents: DataFrame, candidates: DataFrame) -> DataFrame:
    """Verify candidate pairs with exact word-set Jaccard (join back the
    token sets only for the candidate pairs — never all-pairs)."""
    toks = documents.select("doc_id", _words().alias("words"))
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        candidates.join(a, candidates["doc_a"] == F.col("a.doc_id"))
        .join(b, candidates["doc_b"] == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("a.words", "b.words"))
                / F.size(F.array_union("a.words", "b.words")),
                4,
            ).alias("jaccard"),
        )
    )


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word xxhash64 values (JVM-side; bit votes via
    aggregate over exploded words)."""
    sc = documents.sparkSession.sparkContext
    words = documents.repartition(sc.defaultParallelism, "doc_id").select(
        "doc_id", F.explode(_words()).alias("word")
    )
    hashed = words.withColumn("h", F.xxhash64("word"))
    one = F.lit(1).cast("long")
    bit_cols = [
        F.sum(F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = hashed.groupBy("doc_id").agg(*bit_cols)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 lands on the sign bit — the signature is a signed 64-bit
        # value, consistent as long as producers/consumers agree.
        sig = sig + F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sig.alias("simhash"))
