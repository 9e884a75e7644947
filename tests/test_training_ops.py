"""Training-data pipeline operators over the driver's synthetic tables."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_total_preserved(docs):
    from dr_source_spark.training.dedup import exact_duplicates

    groups = exact_duplicates(docs)
    assert groups.agg(F.sum("dup_count")).first()[0] == docs.count()


def test_minhash_signature_shape(docs):
    from dr_source_spark.training.dedup import minhash_signatures

    sigs = minhash_signatures(docs.limit(20), num_hashes=8)
    rows = sigs.collect()
    assert len(rows) == 20 * 8
    assert all(len(r.minhash) == 32 for r in rows)  # md5 hex


def test_minhash_identical_docs_collide(spark):
    from dr_source_spark.training.dedup import minhash_lsh_candidates

    pairs_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(pairs_df).collect()}
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} for p in pairs)


def test_ngram_jaccard_on_candidates(spark):
    from dr_source_spark.training.dedup import minhash_lsh_candidates, ngram_jaccard

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b x y")],
        "doc_id long, text string",
    )
    cands = minhash_lsh_candidates(df)
    j = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard(df, cands).collect()}
    assert j.get((1, 2)) == 1.0


def test_simhash_near_identical(spark):
    from dr_source_spark.training.dedup import simhash

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely unrelated")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in simhash(df).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])


def test_brute_force_topk_self_excluded(emb):
    from dr_source_spark.training.similarity import brute_force_topk

    out = brute_force_topk(emb, query_ids=[0, 1], k=3)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r.n_id != r.q_id for r in rows)
    assert all(1 <= r.rank <= 3 for r in rows)


def test_lsh_topk_subset_of_bucket(emb):
    from dr_source_spark.training.similarity import lsh_bucketed_topk

    out = lsh_bucketed_topk(emb, query_ids=[0, 1, 2], k=3, num_planes=4)
    rows = out.collect()
    assert all(r.n_id != r.q_id for r in rows)


def test_quality_and_tokens(docs):
    from dr_source_spark.training.text import quality_score, token_count

    q = quality_score(docs.limit(10)).collect()
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in q)
    t = token_count(docs.limit(10)).collect()
    assert all(r.n_tokens > 0 for r in t)
