"""Sequence packing + distributed prefix sum (training/pack.py,
operators/prefix.py)."""

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr_source_spark.operators.prefix import global_prefix_sum  # noqa: E402
from dr_source_spark.training.pack import pack_sequences  # noqa: E402


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, n in enumerate([7, 0, 130, 128, 1, 63, 300, 2, 0, 50], start=1)
    ]
    rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_sum_equals_global_window(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 3 + 17).alias("k"), (F.col("id") % 13).alias("v")
    )
    got = global_prefix_sum(df, "k", "v", n_buckets=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("prefix_excl", F.coalesce(F.sum("v").over(w), F.lit(0)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_prefix_sum_empty_and_single(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert global_prefix_sum(empty, "k", "v").count() == 0
    one = spark.createDataFrame([(5, 9)], "k long, v long")
    assert global_prefix_sum(one, "k", "v").collect()[0].prefix_excl == 0


def test_prefix_sum_no_full_data_single_partition(spark):
    """The only SinglePartition exchange allowed is over the bucket
    totals (n_buckets rows), never over the input data."""
    df = spark.range(0, 10_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = (
        global_prefix_sum(df, "k", "v", n_buckets=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the data path shuffles by bucket; a single-partition exchange may
    # appear only once (bucket-totals window)
    assert plan.count("Exchange SinglePartition") <= 1
    assert "hashpartitioning(_b" in plan


def test_pack_tiles_documents(spark, docs):
    """Per doc: slices start at 0, are contiguous, and sum to n_tokens."""
    out = pack_sequences(docs, seq_tokens=128).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.coalesce(F.regexp_count("text", F.lit(r"\w+")).cast("long"), F.lit(0)).alias("n"),
        ).collect()
    }
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.seq_id)
        assert rows[0].doc_tok_start == 0
        pos = 0
        for r in rows:
            assert r.doc_tok_start == pos
            assert r.n_toks > 0
            pos += r.n_toks
        assert pos == n_tok[d]
    # zero-token docs emit nothing
    for d, n in n_tok.items():
        assert (d in by_doc) == (n > 0)


def test_pack_sequences_are_dense(spark, docs):
    """Every sequence but the last is exactly full and gapless."""
    out = pack_sequences(docs, seq_tokens=128).collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    last = max(by_seq)
    total = sum(r.n_toks for rows in by_seq.values() for r in rows)
    assert set(by_seq) == set(range(last + 1))
    for s, rows in by_seq.items():
        rows.sort(key=lambda r: r.seq_tok_start)
        pos = 0
        for r in rows:
            assert r.seq_tok_start == pos
            pos += r.n_toks
        if s < last:
            assert pos == 128
    assert total == sum(
        r.n
        for r in docs.select(
            F.coalesce(F.regexp_count("text", F.lit(r"\w+")).cast("long"), F.lit(0)).alias("n")
        ).collect()
    )


def test_pack_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_tokens=0)


def test_shard_plan_packs_kept_docs_in_order(spark):
    from dr_source_spark.training.pack import shard_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in
         [(1, 100), (2, 100), (3, 100), (4, 5), (5, 100)]],
        "doc_id long, text string",
    )
    keep = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, True), (5, True)],
        "doc_id long, keep boolean",
    )
    out = {r.doc_id: (r.shard_id, r.shard_tok_offset) for r in
           shard_plan(docs, keep, shard_tokens=150).collect()}
    # doc 3 dropped; offsets are the running sum of kept docs only
    assert 3 not in out
    assert out[1] == (0, 0)
    assert out[2] == (0, 100)     # starts inside shard 0, overruns it
    assert out[4] == (1, 50)      # 200 tokens before it -> shard 1
    assert out[5] == (1, 55)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        shard_plan(docs, keep, shard_tokens=0)


def test_prefix_sum_rejects_null_order_keys(spark):
    """A NULL order key would silently vanish in the bucket-offset join
    (join-on-NULL never matches) — the helper must fail fast instead of
    losing rows."""
    import pytest

    from dr_source_spark.operators.prefix import global_prefix_sum

    df = spark.createDataFrame([(1, 10), (None, 20), (3, 30)], "k long, v long")
    with pytest.raises(ValueError, match="NULL 'k'"):
        global_prefix_sum(df, "k", "v").collect()
