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


# Language-ID marker patterns: high-frequency function words per language
# (public linguistic facts) + CJK codepoint range for zh. Both Java regex
# and RE2 accept these forms, so oracles reproduce the scores exactly.
LANG_MARKERS = [
    ("en", r"(?i)\b(the|and|of|to|in|is|that|for|it|with)\b"),
    ("es", r"(?i)\b(el|los|las|que|y|un|una|por|para|como)\b"),
    ("de", r"(?i)\b(der|die|und|das|nicht|ein|eine|mit|ist|auch)\b"),
    ("fr", r"(?i)\b(le|les|et|des|une|est|dans|pour|qui|vous)\b"),
    ("zh", r"[\x{4e00}-\x{9fff}]"),
]


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language identification: per-language marker-hit counts
    (one vectorized JVM regexp_count per language — no Python), argmax with
    a fixed precedence order for ties (the LANG_MARKERS order). Returns the
    per-language scores alongside the decision so downstream filters can
    threshold on confidence."""
    scores = {lang: F.regexp_count(F.col("text"), F.lit(pat)).cast("long") for lang, pat in LANG_MARKERS}
    best = F.greatest(*scores.values())
    decision = None
    for lang, _ in LANG_MARKERS:
        cond = scores[lang] == best
        decision = F.when(cond, F.lit(lang)) if decision is None else decision.when(cond, F.lit(lang))
    return documents.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang, _ in LANG_MARKERS],
        decision.alias("lang_id"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: sha256 of normalized text
    (lower, collapsed whitespace). The exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return documents.select("doc_id", F.sha2(norm, 256).alias("fingerprint"))


def winnow_fingerprints(documents: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): rolling
    k-gram hashes over the lowercased text, min-sampled per window of ``w``
    consecutive positions → per-doc distinct-fingerprint count + the global
    min as a compact sketch column. Guarantees every shared substring of
    length >= k+w-1 yields at least one shared fingerprint — the positional
    near-dup detector exact dedup and bag-of-words MinHash both miss.

    Hashes are md5 (portable family, same as minhash), so the DuckDB oracle
    reproduces every fingerprint. The positions explode is O(text length)
    rows per doc — inherent to positional fingerprinting; rows are narrow
    (doc_id, pos, 32-char hex) and die into the per-doc aggregate. Short
    texts (< k+w-1 chars) fall back to one partial-window fingerprint so
    every document gets a row."""
    from pyspark.sql.window import Window

    t = F.lower(F.col("text"))
    positions = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    grams = documents.select(
        "doc_id", F.explode(positions).alias("pos"), t.alias("_t")
    ).select("doc_id", "pos", F.md5(F.col("_t").substr(F.col("pos"), F.lit(k))).alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy("doc_id")
    mins = grams.select(
        "doc_id",
        "pos",
        F.min("h").over(win).alias("wmin"),
        F.count("*").over(per_doc).alias("_n"),
    ).filter(F.col("pos") <= F.greatest(F.col("_n") - (w - 1), F.lit(1)))
    return mins.groupBy("doc_id").agg(
        F.countDistinct("wmin").cast("long").alias("n_fingerprints"),
        F.min("wmin").alias("min_fingerprint"),
    )


# BPE-ish pre-tokenizer (GPT-2 shape minus the \s+(?!\S) lookahead, which
# RE2 — the DuckDB oracle dialect — doesn't support): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
# Verified count-identical between Java regex and RE2 on the driver corpus.
BPE_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(documents: DataFrame) -> DataFrame:
    """Token counts under the BPE-ish pre-tokenizer — the training-data
    budget estimator (pre-tokens upper-bound BPE merges); JVM regexp_count,
    no UDF. Reported next to the whitespace-word count for comparison."""
    return documents.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_PRETOKEN)).cast("long").alias("n_bpe_pretokens"),
        F.regexp_count(F.col("text"), F.lit(r"\w+")).cast("long").alias("n_word_tokens"),
    )
