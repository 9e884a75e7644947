"""Text-analysis operators for training-data pipelines over a `documents`
table (doc_id, text, lang, source, n_chars). All JVM-side built-ins — no
Python in the hot path; each is expressible in ANSI SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace/word tokenization counts per document (JVM regexp_count)."""
    return documents.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\w+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Cheap quality heuristics: length, mean token length, stopword ratio.

    Rounded to fixed decimals so results are engine-portable (oracle parity).
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return documents.select(
        "doc_id",
        "lang",
        n_toks.cast("long").alias("n_tokens"),
        F.round(F.length("text") / F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        F.round(stop_hits / F.greatest(n_toks, F.lit(1)), 4).alias("stopword_ratio"),
    )


def lang_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus profile (hash aggregate; partial+final from Catalyst)."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: sha256 of normalized text
    (lower, collapsed whitespace). The exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return documents.select("doc_id", F.sha2(norm, 256).alias("fingerprint"))
