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
    # universal-family values: integers in [0, P) with P the smallest
    # prime > 2^32 (training/dedup.py:_MINHASH_P)
    assert all(0 <= r.minhash < 4294967311 for r in rows)


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
    assert all(len(s) == 16 for s in sigs.values())  # portable hex form

    def hamming(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])


def test_simhash_hamming_column_matches_python(spark):
    from dr_source_spark.training.dedup import simhash, simhash_hamming

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat")],
        "doc_id long, text string",
    )
    sigs = simhash(df)
    a = sigs.filter(F.col("doc_id") == 1).select(F.col("simhash").alias("sa"))
    b = sigs.filter(F.col("doc_id") == 2).select(F.col("simhash").alias("sb"))
    row = a.crossJoin(b).select(
        "sa", "sb", simhash_hamming(F.col("sa"), F.col("sb")).alias("d")
    ).first()
    assert row.d == bin(int(row.sa, 16) ^ int(row.sb, 16)).count("1")


def test_simhash_pairs_match_nibblewise_reference(spark):
    # round-6 restructure gate: the narrow-join + half-XOR shape of
    # simhash_near_dup_pairs must reproduce the pre-restructure result —
    # banded self-join carrying signatures, nibble-wise simhash_hamming,
    # distinct over (doc_a, doc_b, hamming) — row for row
    from dr_source_spark.training.dedup import (
        simhash, simhash_hamming, simhash_near_dup_pairs,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = [
        (i, " ".join(words[j % len(words)] for j in range(i, i + 4 + i % 3)))
        for i in range(40)
    ]
    rows += [(100, rows[3][1]), (101, rows[3][1])]  # planted exact dups
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = simhash(df)
    bands, width = 4, 4
    banded = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.substring("simhash", 1 + i * width, width).alias("band_sig"))
            for i in range(bands)
        ])).alias("bs"),
    ).select("doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
    a, b = banded.alias("a"), banded.alias("b")
    ref = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                simhash_hamming(F.col("a.simhash"), F.col("b.simhash")).cast("long").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    got = simhash_near_dup_pairs(df)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # planted exact dups must surface at hamming 0
    got_map = {(r.doc_a, r.doc_b): r.hamming for r in got.collect()}
    assert got_map.get((100, 101)) == 0 and got_map.get((3, 100)) == 0


def test_lsh_cluster_cap_drops_viral_group_observably(spark):
    from dr_source_spark.training.dedup import lsh_oversized_clusters, minhash_lsh_candidates

    # 12 identical docs = one viral cluster (66 pairs), plus one true pair
    rows = [(i, "viral duplicate cluster text") for i in range(12)]
    rows += [(100, "unique pair of documents"), (101, "unique pair of documents")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_candidates(df, num_hashes=16, bands=2, max_cluster=0)
    capped = minhash_lsh_candidates(df, num_hashes=16, bands=2, max_cluster=10)
    assert {(r.doc_a, r.doc_b) for r in capped.collect()} == {(100, 101)}
    assert uncapped.count() == 66 + 1
    # the drop is observable, never silent
    dropped = lsh_oversized_clusters(df, num_hashes=16, bands=2, max_cluster=10).collect()
    assert {r.n_docs for r in dropped} == {12}
    # ... and ALSO rides the candidates query itself as an in-plan observe
    # metric, so callers who never run the companion query still see it
    jqe = capped._jdf.queryExecution()
    assert "lsh_cap_drops" in jqe.analyzed().toString()
    it = jqe.observedMetrics().iterator()
    metrics = {}
    while it.hasNext():
        kv = it.next()
        metrics[kv._1()] = kv._2()
    row = next(v for k, v in metrics.items() if k.startswith("lsh_cap_drops"))
    # 2 bands x 1 viral signature each = 2 oversized clusters of 12 docs
    assert row.getLong(0) == 2 and row.getLong(1) == 24


def test_lsh_scale_defaults_shrink_candidates_at_equal_recall(docs):
    """Round-2 banding (112/14, r=8) must emit far fewer candidates than the
    round-1 defaults (8/4, r=2) while still catching every known duplicate."""
    from dr_source_spark.training.dedup import minhash_lsh_candidates

    base = docs.limit(60).select("doc_id", "text")
    # known duplicates: exact copies shifted into a disjoint id space
    copies = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    corpus = base.unionByName(copies)
    known = {(r.doc_id, r.doc_id + 1_000_000) for r in base.collect()}

    old = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(corpus, num_hashes=8, bands=4).collect()}
    new = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(corpus).collect()}
    assert known <= old and known <= new  # equal (full) recall on true dups
    assert len(new) < len(old)


def test_brute_force_topk_self_excluded(emb):
    from dr_source_spark.training.similarity import brute_force_topk

    out = brute_force_topk(emb, query_ids=[0, 1], k=3)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r.n_id != r.q_id for r in rows)
    assert all(1 <= r.rank <= 3 for r in rows)


def test_lsh_topk_subset_of_bucket(emb):
    from dr_source_spark.training.similarity import lsh_bucketed_topk

    out = lsh_bucketed_topk(emb, query_ids=[0, 1, 2], k=3, planes_per_table=4)
    rows = out.collect()
    assert all(r.n_id != r.q_id for r in rows)


def test_lsh_topk_recall_gate_vs_brute_force(emb):
    """Approximate top-k is falsifiable: recall@k vs the exact baseline must
    hold ≥ 0.9 at the default table/plane configuration."""
    from dr_source_spark.training.similarity import brute_force_topk, lsh_bucketed_topk

    qids = [0, 1, 2, 3, 4]
    exact = {(r.q_id, r.n_id) for r in brute_force_topk(emb, query_ids=qids, k=3).collect()}
    approx = {(r.q_id, r.n_id) for r in lsh_bucketed_topk(emb, query_ids=qids, k=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@3 = {recall}"


def test_lang_id_on_real_language_snippets(spark):
    from dr_source_spark.training.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy with the sun"),
            (2, "el perro corre por el parque y las flores son bonitas como siempre"),
            (3, "der Hund läuft durch den Park und die Blumen sind auch schön"),
            (4, "le chien court dans le parc et les fleurs sont belles pour vous"),
            (5, "这是一段中文文本用来测试语言识别"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_id for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh"}


def test_quality_and_tokens(docs):
    from dr_source_spark.training.text import quality_score, token_count

    q = quality_score(docs.limit(10)).collect()
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in q)
    t = token_count(docs.limit(10)).collect()
    assert all(r.n_tokens > 0 for r in t)


def test_ivf_topk_recall_floor(emb):
    """IVF with 8 cells / nprobe 2 must hold recall@3 >= 0.9 vs brute force
    on the driver embeddings (same falsifiability bar as the LSH path)."""
    from dr_source_spark.training.similarity import brute_force_topk, ivf_topk

    qids = list(range(10))
    bf = {(r.q_id, r.n_id) for r in brute_force_topk(emb, qids, k=3).collect()}
    iv = {(r.q_id, r.n_id) for r in ivf_topk(emb, qids, k=3).collect()}
    assert len(bf & iv) / len(bf) >= 0.9
    # plan shape: candidate join is equi on cell id, never all-pairs
    plan = ivf_topk(emb, qids, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan


def test_ivf_topk_survives_nonzero_id_space(emb):
    """Centroids are the n_cells SMALLEST ids, not ids < n_cells: an id
    space offset away from 0 must still produce a full result set instead
    of silently returning zero rows (ADVICE r3)."""
    from pyspark.sql import functions as F

    from dr_source_spark.training.similarity import ivf_topk

    shifted = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    qids = [1000, 1001, 1002]
    out = ivf_topk(shifted, qids, k=3).collect()
    assert {r.q_id for r in out} == set(qids)
    assert all(len([r for r in out if r.q_id == q]) == 3 for q in qids)


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining property: documents sharing a substring of
    length >= k + w - 1 share at least one fingerprint; disjoint texts
    share none."""
    from dr_source_spark.training.text import winnow_fingerprints
    from pyspark.sql import functions as F

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "cccc dddd " + shared),
        (3, "completely different content with zero overlap here xyzq"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # fingerprint SETS via the same pipeline internals: re-aggregate as sets
    from dr_source_spark.training.text import winnow_fingerprints as _wf  # noqa: F401
    k, w = 8, 4
    t = F.lower(F.col("text"))
    grams = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))).alias("pos"), t.alias("_t")
    ).select("doc_id", "pos", F.md5(F.col("_t").substr(F.col("pos"), F.lit(k))).alias("h"))
    from pyspark.sql.window import Window
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n = Window.partitionBy("doc_id")
    sets = {
        r.doc_id: set(r.fps)
        for r in grams.select("doc_id", "pos", F.min("h").over(win).alias("m"), F.count("*").over(n).alias("_n"))
        .filter(F.col("pos") <= F.greatest(F.col("_n") - (w - 1), F.lit(1)))
        .groupBy("doc_id").agg(F.collect_set("m").alias("fps")).collect()
    }
    assert sets[1] & sets[2], "shared substring must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # and the public aggregate runs over the same pipeline
    assert winnow_fingerprints(docs).count() == 3


def test_shingle_minhash_catches_word_reorder(spark):
    """Character-shingle signatures collide on texts word-set minhash sees
    as identical AND stay closer than unrelated texts under edits."""
    from dr_source_spark.training.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),   # identical
         (3, "alpha beta gamma delta epsilonX"),  # one-char edit
         (4, "totally unrelated words entirely")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=5)
    by_doc = {}
    for r in sigs.collect():
        by_doc.setdefault(r.doc_id, {})[r.seed] = r.minhash
    agree = lambda a, b: sum(by_doc[a][s] == by_doc[b][s] for s in by_doc[a]) / 16
    assert agree(1, 2) == 1.0
    assert agree(1, 3) > agree(1, 4)


def test_simhash_pairs_pigeonhole_complete(docs):
    """Banded simhash pairs must equal brute-force all-pairs at
    max_hamming <= bands-1 (pigeonhole: 3 differing bits can't touch all
    4 bands, so every qualifying pair shares at least one band)."""
    from dr_source_spark.training.dedup import simhash, simhash_near_dup_pairs

    sample = docs.limit(120)
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(sample, bands=4, max_hamming=3).collect()
    }
    sigs = {r.doc_id: int(r.simhash, 16) for r in simhash(sample).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert banded == brute


def test_token_count_bpe_known_strings(spark):
    from dr_source_spark.training.text import token_count_bpe

    df = spark.createDataFrame(
        [(1, "I'll say it's 42 tokens, right?"), (2, ""), (3, "hello")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bpe_pretokens, r.n_word_tokens) for r in token_count_bpe(df).collect()}
    # "I" "'ll" " say" " it" "'s" " 42" " tokens" "," " right" "?" = 10
    assert got[1] == (10, 8)
    assert got[2] == (0, 0)
    assert got[3] == (1, 1)


def test_duplicate_clusters_matches_union_find(docs):
    """Alternating-star components must equal a reference union-find over
    the same verified pair graph; every doc labeled, singletons self."""
    from dr_source_spark.training.dedup import (
        duplicate_clusters,
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    pairs = ngram_jaccard(docs, minhash_lsh_candidates(docs)).filter(F.col("jaccard") >= 0.9)
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(docs, pairs=pairs).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    want = {n: min([root] + members) for root, members in comp.items() for n in members}
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for d in all_ids:
        want.setdefault(d, d)
    # min-root canonical: recompute want properly (find gives root = min already)
    assert got == {d: find(d) if d in parent else d for d in all_ids}


def test_verified_pairs_restructured_path_row_identical(docs):
    """The round-6 fused verify pipeline (one tokenize/signature pass,
    size-bound candidate pruning, union size via na+nb-|A∩B|) must return
    EXACTLY the rows of the composed form it replaces — and the default
    duplicate_clusters must equal the explicit-pairs path built from the
    composed form."""
    from dr_source_spark.training.dedup import (
        _verified_near_dup_pairs,
        duplicate_clusters,
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    composed = ngram_jaccard(docs, minhash_lsh_candidates(docs)).filter(
        F.col("jaccard") >= 0.9
    )
    want = {(r.doc_a, r.doc_b, r.jaccard) for r in composed.collect()}
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in _verified_near_dup_pairs(docs, 0.9).collect()}
    assert got == want and len(want) > 0
    want_c = {(r.doc_id, r.cluster_id) for r in duplicate_clusters(docs, pairs=composed).collect()}
    got_c = {(r.doc_id, r.cluster_id) for r in duplicate_clusters(docs).collect()}
    assert got_c == want_c


def test_union_find_numpy_variant_matches_dict_reference():
    """The numpy min-label-propagation CC (kept for reference; the dict
    loop measured faster and stays the driver path) must produce the
    identical (node, component-min) set on ints and strings."""
    import random

    from dr_source_spark.operators.graph import (
        _driver_union_find_dict,
        _driver_union_find_np,
    )

    random.seed(5)
    edges = [(random.randrange(300), random.randrange(300)) for _ in range(900)]
    d = sorted(_driver_union_find_dict(edges))
    n = sorted((int(a), int(b)) for a, b in _driver_union_find_np(edges))
    assert d == n
    sedges = [(f"v{a}", f"v{b}") for a, b in edges]
    ds = sorted(_driver_union_find_dict(sedges))
    ns = sorted((str(a), str(b)) for a, b in _driver_union_find_np(sedges))
    assert ds == ns
    assert _driver_union_find_np([]) == []


def test_duplicate_clusters_chain_converges_logarithmically(spark):
    """A 64-node path graph (diameter 63 — label propagation's worst case)
    must fully merge within the star algorithm's O(log n) round budget."""
    from dr_source_spark.training.dedup import duplicate_clusters

    docs = spark.createDataFrame([(i, "x") for i in range(64)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    out = duplicate_clusters(docs, pairs=pairs, max_rounds=8).collect()
    assert {r.cluster_id for r in out} == {0}


def test_duplicate_clusters_no_pairs_all_singletons(spark):
    from dr_source_spark.training.dedup import duplicate_clusters

    docs = spark.createDataFrame([(i, "t") for i in (3, 7, 11)], "doc_id long, text string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r.doc_id: r.cluster_id for r in duplicate_clusters(docs, pairs=pairs).collect()}
    assert out == {3: 3, 7: 7, 11: 11}


def test_repetition_metrics_known_values(spark):
    from dr_source_spark.training.text import repetition_metrics

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a b a b a b"), (4, "x\ny\nx")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.dup_line_frac, r.dup_word_frac, r.top_bigram_frac)
        for r in repetition_metrics(df).collect()
    }
    assert got[1] == (1, 0.0, 0.0, 0.0)
    assert got[2] == (1, 0.0, 0.0, 0.0)
    # "a b a b a b": 6 words 2 distinct; bigrams a-b x3, b-a x2 -> 3/5
    assert got[3] == (1, 0.0, round(4 / 6, 4), 0.6)
    # "x\ny\nx": 3 lines, 2 distinct
    assert got[4] == (3, 0.3333, 0.3333, 0.5)


def test_ngram_overlap_planted_contamination(spark):
    from dr_source_spark.training.text import ngram_overlap

    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13"
    corpus = spark.createDataFrame(
        [
            (1, f"prefix {run} suffix"),       # contains the full 13-token run
            (2, "totally different words " * 5),
            (3, "short doc"),                    # < 13 tokens: no grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, run)], "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): r.n_shared_ngrams for r in ngram_overlap(corpus, bench).collect()}
    assert got == {(1, 100): 1}  # exactly the one shared 13-gram


def test_quantization_error_bound_and_range(emb):
    """Symmetric int8: every component within [-127, 127]; dequantization
    error bounded by scale/2 (the rounding half-step)."""
    from dr_source_spark.training.similarity import quantization_stats, quantize_embeddings

    q = quantize_embeddings(emb)
    mx = q.select(
        F.max(F.aggregate("qvec", F.lit(0), lambda a, x: F.greatest(a, F.abs(x)))).alias("m")
    ).first().m
    assert mx <= 127
    bad = quantization_stats(emb).filter(
        F.col("max_abs_err") > F.col("scale") / 2 + 1e-12
    ).count()
    assert bad == 0


def test_quantize_zero_vector_scale_fallback(spark):
    # round-6 zip_with restructure gate: the zero-vector guard
    # (scale -> 1.0) and empty vectors must survive the hoisted-scale
    # form unchanged
    from dr_source_spark.training.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5]), (2, [])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert rows[0].scale == 1.0 and rows[0].qvec == [0, 0, 0]
    assert rows[1].scale == pytest.approx(2.0 / 127.0)
    assert rows[1].qvec == [64, -127, 32]
    assert rows[2].qvec == []


def test_quantized_search_recall_vs_float(emb):
    """Top-k over DEQUANTIZED int8 vectors must recover >= 0.9 of the exact
    float top-k — the falsifiability gate for the 4x-memory ANN path."""
    from dr_source_spark.training.similarity import brute_force_topk, quantize_embeddings

    deq = quantize_embeddings(emb).select(
        "vec_id",
        F.zip_with(
            "qvec", F.array_repeat("scale", F.size("qvec")), lambda q, s: q.cast("double") * s
        ).alias("embedding"),
    )
    qids = [0, 1, 2, 3, 4]
    exact = {(r.q_id, r.n_id) for r in brute_force_topk(emb, query_ids=qids, k=3).collect()}
    approx = {(r.q_id, r.n_id) for r in brute_force_topk(deq, query_ids=qids, k=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@3 = {recall}"


def test_pagerank_fixed_point_matches_python_reference(spark):
    """The fixed-point Spark PageRank must equal a straightforward Python
    implementation using the identical integer floor arithmetic."""
    from dr_source_spark.operators.graph import pagerank_fixed_point

    edge_list = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")]  # c dangling
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.node: r.rank for r in pagerank_fixed_point(edges, iterations=10).collect()}

    SCALE, DP = 10**12, 85
    nodes = sorted({x for e in edge_list for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    base = (SCALE * (100 - DP)) // (100 * n)
    for _ in range(10):
        dangling = sum(rank[v] for v in nodes if v not in out)
        share = (dangling * DP) // (100 * n)
        contrib = {v: 0 for v in nodes}
        for s, d in edge_list:
            contrib[d] += (rank[s] * DP) // (100 * out[s])
        rank = {v: base + share + contrib[v] for v in nodes}
    assert got == rank
    # hub 'c' (two in-edges + dangling redistribution) outranks leaf 'd'
    assert got["c"] > got["d"]


def test_pii_scrub_known_patterns(spark):
    from dr_source_spark.training.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "server 192.168.1.200 card 4111 1111 1111 1111"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert "<PII:EMAIL>" in got[1].scrubbed_text and "<PII:PHONE>" in got[1].scrubbed_text
    assert "example.co.uk" not in got[1].scrubbed_text
    assert got[2].n_ipv4 == 1 and got[2].n_card == 1
    assert "<PII:IPV4>" in got[2].scrubbed_text and "<PII:CARD>" in got[2].scrubbed_text
    assert got[3].scrubbed_text == "nothing sensitive here"


def test_sample_stratified_deterministic_and_rate_shaped(docs):
    from dr_source_spark.training.text import sample_stratified

    rates = {"en": 0.5, "es": 0.25}
    a = {r.doc_id for r in sample_stratified(docs, rates).collect()}
    b = {r.doc_id for r in sample_stratified(docs, rates).collect()}
    assert a == b  # seedless and deterministic
    c = {r.doc_id for r in sample_stratified(docs, rates, salt="v2").collect()}
    assert c != a  # a new salt draws an independent sample
    full = {r.doc_id for r in sample_stratified(docs, {"en": 1.0}).collect()}
    en_total = docs.filter(F.col("lang") == "en").count()
    assert len(full) == en_total  # rate 1.0 keeps every stratum member


def test_triangle_counts_known_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant 5 + isolated
    self-loop 6: degree-ordered orientation must count exactly and
    zero-fill non-triangle nodes; self-loops never count."""
    from dr_source_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5), (6, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}, got


def test_weighted_sssp_cheap_detour_beats_direct_edge(spark):
    """1 -10-> 4 direct, but 1 -1-> 2 -1-> 3 -1-> 4 costs 3: after enough
    sweeps the detour must win. Parallel edges keep their min weight;
    reversed duplicates collapse; the seed itself is dist 0."""
    from dr_source_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 4, 10), (1, 2, 1), (2, 1, 5), (2, 3, 1), (3, 4, 1), (1, 2, 7)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "doc_id long")
    got = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}, got


def test_weighted_sssp_rounds_bound_path_length(spark):
    """After k sweeps dist is the cheapest path using <= k EDGES — the
    bounded-iteration contract the unrolled SQL oracle relies on. On the
    weighted line 1-2-3-4 (w=1 each) plus the w=10 shortcut 1->4,
    rounds=1 sees only the direct edge (10); rounds=3 finds the length-3
    path (3). Unreached nodes have no row."""
    from dr_source_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 10), (8, 9, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "doc_id long")
    r1 = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=1).collect()}
    assert r1 == {1: 0, 2: 1, 4: 10}, r1
    r3 = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=3).collect()}
    assert r3 == {1: 0, 2: 1, 3: 2, 4: 3}, r3


def test_weighted_sssp_multi_seed_and_self_loop(spark):
    """Multiple seeds relax independently (each node takes the nearest);
    self-loops are dropped (they can never improve a distance); an
    edge-less seed still reports dist 0."""
    from dr_source_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 5), (3, 2, 1), (2, 2, 0)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,), (3,), (7,)], "doc_id long")
    got = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=2).collect()}
    assert got == {1: 0, 2: 1, 3: 0, 7: 0}, got


def test_neighbor_jaccard_known_graph(spark):
    """Hand-checked wedge graph: nodes 1 and 2 both neighbor {3, 4}
    (and each other via nothing else), so N(1) = N(2) = {3, 4} -> 100 %;
    node 5 neighbors {3} only -> shares 1 neighbor with 1/2, below
    min_common=2. Duplicate/reversed edges must not inflate counts."""
    from dr_source_spark.operators.graph import neighbor_jaccard

    edges = [(1, 3), (3, 1), (1, 4), (2, 3), (2, 4), (4, 2), (5, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {
        (r.node_a, r.node_b): (r.n_common, r.deg_a, r.deg_b, r.jaccard_pct)
        for r in neighbor_jaccard(df, min_pct=0, min_common=2).collect()
    }
    # (1,2) share {3,4} with N(1)=N(2)={3,4} -> 100 %; (3,4) share {1,2}
    # with N(3)={1,2,5}, N(4)={1,2} -> 2/3 -> 66
    assert rows == {(1, 2): (2, 2, 2, 100), (3, 4): (2, 3, 2, 66)}, rows
    # min_common=1 admits the weak single-shared-neighbor pairs:
    # (1,5),(2,5) share {3} with |union| = 2 -> 50
    weak = {
        (r.node_a, r.node_b): r.jaccard_pct
        for r in neighbor_jaccard(df, min_pct=0, min_common=1).collect()
    }
    assert weak == {(1, 2): 100, (1, 5): 50, (2, 5): 50, (3, 4): 66}, weak


def test_neighbor_jaccard_hub_cap_drops_centers_not_arithmetic(spark):
    """With max_hub_degree=2 the degree-3 hub (node 3) stops generating
    wedges, so pairs that only co-occur at the hub disappear — but pairs
    surviving via other centers keep their EXACT degree arithmetic (the
    cap prunes candidates, never corrupts |N(a)|/|N(b)|)."""
    from dr_source_spark.operators.graph import neighbor_jaccard

    edges = [(1, 3), (2, 3), (5, 3), (1, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    capped = {
        (r.node_a, r.node_b): (r.n_common, r.deg_a, r.deg_b)
        for r in neighbor_jaccard(
            df, min_pct=0, min_common=1, max_hub_degree=2
        ).collect()
    }
    # the degree-3 hub stops generating wedges, so (1,2)'s shared-neighbor
    # count drops from 2 to 1 (only center 4 survives); node 3 still
    # participates as a wedge LEAF at centers 1/2, and deg_a/deg_b stay
    # the true degrees everywhere — the cap prunes candidates, never
    # corrupts the arithmetic
    assert capped == {(1, 2): (1, 2, 2), (3, 4): (2, 3, 2)}, capped


def test_triangle_counts_duplicate_and_reversed_edges(spark):
    """(a,b) + (b,a) + repeats are ONE undirected edge — the triangle
    count must not inflate."""
    from dr_source_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}, got


def test_bfs_distances_known_graph(spark):
    """Path 1-2-3-4 with branch 2-5, seed {1}: exact min-hop distances;
    disconnected node 9 absent; max_hops truncates the frontier."""
    from dr_source_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (9, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hops for r in bfs_distances(edges, seeds, max_hops=6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}, got
    truncated = {r.node: r.hops for r in bfs_distances(edges, seeds, max_hops=1).collect()}
    assert truncated == {1: 0, 2: 1}, truncated


def test_quantized_topk_recall_vs_brute_force(emb):
    """Int8-quantized dot-product ranking must hold recall@3 >= 0.8 vs
    exact float cosine on the driver embeddings (the two-stage ANN
    contract: quantized candidates, float rescore)."""
    from dr_source_spark.training.similarity import brute_force_topk, quantized_topk

    qids = list(range(10))
    bf = {(r.q_id, r.n_id) for r in brute_force_topk(emb, qids, k=3).collect()}
    qz = {(r.q_id, r.n_id) for r in quantized_topk(emb, qids, k=3).collect()}
    assert len(bf & qz) / len(bf) >= 0.8


def test_chunk_plan_coverage_properties(docs):
    """Chunk plans must tile each document: first chunk starts at 0, the
    last ends at n_tokens, consecutive chunks overlap by exactly
    `overlap` (except a short final chunk), and no chunk is empty."""
    from dr_source_spark.training.text import chunk_plan

    rows = chunk_plan(docs, max_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].start_tok == 0
        assert chunks[-1].end_tok == chunks[0].n_tokens
        assert all(c.end_tok > c.start_tok for c in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok == a.start_tok + 56  # stride = 64 - 8
            assert a.end_tok - b.start_tok in (8,) or a.end_tok == a.n_tokens


def test_containment_catches_subset_docs(spark):
    """A short doc fully contained in a long one: Jaccard is low but
    containment on the short side is 1.0 — the asymmetric-duplication
    signal Jaccard misses."""
    from dr_source_spark.training.dedup import ngram_containment, ngram_jaccard

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"),
         (2, "alpha beta gamma " + " ".join(f"w{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    c = ngram_containment(docs, pairs).collect()[0]
    j = ngram_jaccard(docs, pairs).collect()[0]
    assert c.containment_a == 1.0 and c.containment_b < 0.2
    assert j.jaccard < 0.2


def test_null_and_empty_text_rows_never_escape_curation(spark):
    """Every input doc gets a verdict — NULL text fingerprints as empty,
    groups with other empty docs, and falls out as too_short/duplicate;
    chunk plans emit one empty chunk, never NULL offsets. (Signature ops
    deliberately emit nothing for token-free docs — documented in
    minhash_signatures — so pair sets can't contain them.)"""
    from dr_source_spark.training.curate import curation_decisions
    from dr_source_spark.training.text import chunk_plan

    docs = spark.createDataFrame(
        [(1, "hello world the end"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    cur = {r.doc_id: r.reason for r in curation_decisions(docs).collect()}
    assert set(cur) == {1, 2, 3, 4}
    assert cur[2] in ("too_short", "exact_duplicate")
    ch = {(r.doc_id, r.chunk_idx, r.start_tok, r.end_tok) for r in chunk_plan(docs).collect()}
    assert (2, 0, 0, 0) in ch and (3, 0, 0, 0) in ch
    assert all(v is not None for t in ch for v in t)


def test_zero_norm_and_empty_vectors_cannot_kill_cosine_jobs(spark):
    """Under ANSI mode a single zero-norm / empty / NULL vector used to
    abort the ENTIRE cosine job with DIVIDE_BY_ZERO — at corpus scale one
    bad row must degrade (NULL similarity, excluded from rankings), never
    crash."""
    from dr_source_spark.training.similarity import (
        brute_force_topk, embedding_near_duplicates, quantization_stats,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], 0), (1, [1.0, 2.1, 3.0], 0),
         (2, None, 0), (3, [], 0), (4, [0.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    bf = brute_force_topk(emb, [0], k=3).collect()
    assert {r.n_id for r in bf} == {1}  # degenerate vectors can't rank
    stats = {r.vec_id: r for r in quantization_stats(emb).collect()}
    assert len(stats) == 5 and stats[3].n_dims == 0  # row kept, no crash
    nd = embedding_near_duplicates(emb, threshold=0.5, num_planes=4, dim=3).collect()
    assert {(r.id_a, r.id_b) for r in nd} == {(0, 1)}


def test_boilerplate_spans_merges_adjacent_grams(spark):
    from dr_source_spark.training.text import boilerplate_spans

    head = "one two three four five six"  # 6 tokens, shared by 3 docs
    docs = spark.createDataFrame(
        [
            (1, f"{head} uniq1a uniq1b uniq1c"),
            (2, f"{head} uniq2a uniq2b uniq2c"),
            (3, f"{head} uniq3a uniq3b uniq3c"),
            (4, "totally different text with no shared passage at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = boilerplate_spans(docs, n=3, min_docs=3).collect()
    by_doc = {r.doc_id: r for r in rows}
    # the shared 6-token head = grams at positions 1..4 (n=3) -> ONE merged
    # span [1, 6] with 4 grams, in each of the 3 sharing docs only
    assert set(by_doc) == {1, 2, 3}
    for d in (1, 2, 3):
        r = by_doc[d]
        assert (r.span_start, r.span_end, r.n_grams) == (1, 6, 4)


def test_boilerplate_spans_splits_disjoint_islands(spark):
    from dr_source_spark.training.text import boilerplate_spans

    shared_a = "alpha beta gamma"
    shared_b = "delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (i, f"{shared_a} filler{i}a filler{i}b filler{i}c filler{i}d {shared_b}")
            for i in (1, 2, 3)
        ],
        "doc_id long, text string",
    )
    rows = boilerplate_spans(docs, n=3, min_docs=3).collect()
    spans = sorted((r.span_start, r.span_end) for r in rows if r.doc_id == 1)
    # two disjoint islands: tokens 1-3 and tokens 8-10
    assert spans == [(1, 3), (8, 10)]


def test_bpe_merge_candidates_weights_by_word_freq(spark):
    from dr_source_spark.training.text import bpe_merge_candidates

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "aa cc")],
        "doc_id long, text string",
    )
    rows = bpe_merge_candidates(docs, k=3).collect()
    assert [(r.pair, r.score) for r in rows] == [("aa", 4), ("bb", 1), ("cc", 1)]


def test_kcore_triangle_survives_tail_peeled(spark):
    from dr_source_spark.operators.graph import kcore_nodes

    # triangle 1-2-3 with a pendant chain 3-4-5: the 2-core is exactly the
    # triangle; the chain peels off over two rounds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    rows = {(r.node, r.core_degree) for r in kcore_nodes(edges, k=2).collect()}
    assert rows == {(1, 2), (2, 2), (3, 2)}


def test_kcore_pure_path_empty(spark):
    from dr_source_spark.operators.graph import kcore_nodes

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    assert kcore_nodes(edges, k=2).count() == 0


def test_kcore_direction_and_duplicates_ignored(spark):
    from dr_source_spark.operators.graph import kcore_nodes

    # same triangle expressed with reversed/duplicated/self edges
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (1, 3), (3, 3)], "src long, dst long"
    )
    rows = {(r.node, r.core_degree) for r in kcore_nodes(edges, k=2).collect()}
    assert rows == {(1, 2), (2, 2), (3, 2)}


def test_kmeans_assign_separates_blobs(spark):
    from dr_source_spark.training.similarity import kmeans_assign

    # two tight blobs far apart; seeds are the k smallest ids, so ids 0
    # and 1 land one in each blob — k=2 must then split them exactly
    rows = [(2 * i, [0.1 + 0.001 * i, 0.1]) for i in range(5)]
    rows += [(2 * i + 1, [-0.4 - 0.001 * i, -0.4]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(emb, k=2, iterations=2).collect()
    assert len(out) == 10
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        assert r.dist2 < 0.001  # tight blobs -> small residual
    assert sorted(map(sorted, by_cluster.values())) == [
        [0, 2, 4, 6, 8],
        [1, 3, 5, 7, 9],
    ]


def test_repeated_spans_islands_and_freq_guard(spark):
    """Diagonal islands: a shared passage split by an edit yields TWO
    runs and the longest wins; grams over max_gram_freq are dropped."""
    from dr_source_spark.training.dedup import repeated_spans

    p = lambda a, b: " ".join(f"w{i}" for i in range(a, b))
    docs = spark.createDataFrame(
        [
            # doc 2 = doc 1 with token 10 edited: islands of 10 and 19
            # tokens of shared text -> runs of 6 and 15 grams, spans 10/19
            (1, p(0, 30)),
            (2, p(0, 10) + " EDIT " + p(11, 30)),
            # ultra-repetitive pair: every gram freq > 4 -> no row
            (3, " ".join(["ha"] * 40)),
            (4, " ".join(["ha"] * 40)),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    rows = repeated_spans(docs, cands, n=5, max_gram_freq=4).collect()
    assert len(rows) == 1
    r = rows[0]
    # longest island: tokens 11..29 shared (19 tokens) on diag 0
    assert (r.doc_a, r.doc_b, r.span_tokens, r.start_a, r.start_b) == (1, 2, 19, 11, 11)


def test_repeated_spans_no_shared_gram_no_row(spark):
    from dr_source_spark.training.dedup import repeated_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "u v w x y z")], "doc_id long, text string"
    )
    cands = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    assert repeated_spans(docs, cands).count() == 0


def test_two_hop_paths_chain_and_co_subject(spark):
    import pytest as _pytest

    from dr_source_spark.operators.graph import two_hop_paths

    edges = spark.createDataFrame(
        [
            ("a", "P1", "m"),
            ("m", "P2", "b"),
            ("m", "P1", "x"),
            ("m", "P2", "y"),
            ("a", "P2", "m"),
            ("q", "P9", "r"),
        ],
        "src string, pred string, dst string",
    )
    chain = {tuple(r) for r in two_hop_paths(edges, "P1", "P2", "chain").collect()}
    assert chain == {("a", "m", "b"), ("a", "m", "y")}
    co = {tuple(r) for r in two_hop_paths(edges, "P1", "P2", "co_subject").collect()}
    assert co == {("m", "a", "m"), ("x", "m", "b"), ("x", "m", "y")}
    with _pytest.raises(ValueError):
        two_hop_paths(edges, "P1", "P2", "loop")


def test_lang_mismatch_detects_contamination(spark):
    from dr_source_spark.training.text import lang_mismatch

    docs = spark.createDataFrame(
        [
            (1, "en", "el que los las un una por para como y"),  # spanish text declared en
            (2, "en", "the cat and the dog of the house is that"),  # consistent
            (3, "de", "the cat and the dog of the house is that"),  # english declared de
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r.doc_id: r for r in lang_mismatch(docs).collect()}
    assert set(rows) == {1, 3}
    assert rows[1].lang_id == "es" and rows[1].margin > 0
    assert rows[3].lang_id == "en" and rows[3].score_declared == 0


def test_embedding_duplicate_clusters_known_groups(spark):
    from dr_source_spark.training.similarity import embedding_duplicate_clusters

    def v(*pat):
        base = [0.0] * 64
        for i, x in enumerate(pat):
            base[i] = float(x)
        return base

    # 1,2 identical; 3 close to them; 4 orthogonal singleton
    emb = spark.createDataFrame(
        [(1, v(1, 0)), (2, v(1, 0)), (3, v(1, 0.1)), (4, v(0, 0, 0, 5))],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.cluster_id for r in embedding_duplicate_clusters(emb, threshold=0.9).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


def test_rarity_score_orders_gibberish_above_prose(spark):
    from dr_source_spark.training.text import rarity_score

    common = "the cat and the dog " * 10
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, "zxqv wkjh pqrs mnbv")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in rarity_score(docs).collect()}
    assert rows[3].mean_rarity > rows[1].mean_rarity
    assert rows[1].n_toks == 50
    # exact integer bookkeeping: sum of per-token total//cnt weights
    total = 50 + 50 + 4
    assert rows[3].sum_rarity == 4 * (total // 1)


def test_vocab_coverage_oov_accounting(spark):
    from dr_source_spark.training.text import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa"),
            (2, "aa bb zz"),
            (3, "qq rr ss"),
        ],
        "doc_id long, text string",
    )
    # vocab_size=2 -> vocab = {aa (3), bb (3)}? counts: aa=4? aa appears 3+1=4, bb=2+1=3, others 1
    rows = {r.doc_id: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    assert rows[1].oov_toks == 0 and rows[1].oov_rate == 0.0
    assert rows[2].n_toks == 3 and rows[2].oov_toks == 1
    assert rows[3].oov_toks == 3 and rows[3].oov_rate == 1.0


def test_vuln_cooccurrence_dedups_before_pairing(spark):
    from dr_source_spark.operators.relational import vuln_cooccurrence

    f = spark.createDataFrame(
        [
            ("r", "a.py", "SQLI"), ("r", "a.py", "SQLI"),  # dup finding, one vote
            ("r", "a.py", "XSS"),
            ("r", "b.py", "SQLI"), ("r", "b.py", "XSS"), ("r", "b.py", "SSRF"),
            ("r", "c.py", "SQLI"),  # single-type file: no pair
        ],
        "repo string, path string, vuln_type string",
    )
    out = {(r.type_a, r.type_b): r.n_files for r in vuln_cooccurrence(f).collect()}
    assert out == {("SQLI", "XSS"): 2, ("SQLI", "SSRF"): 1, ("SSRF", "XSS"): 1}


def test_boilerplate_cut_plan_complements_spans(spark):
    """keep ranges + spans tile each doc's token line exactly."""
    from dr_source_spark.training.text import boilerplate_cut_plan, boilerplate_spans

    boiler = " ".join(f"b{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            (1, "u1 u2 " + boiler + " u3 u4"),
            (2, boiler),                      # entirely boilerplate
            (3, "x1 " + boiler),
            (4, boiler + " tail"),
            (5, "clean doc no boiler"),
        ],
        "doc_id long, text string",
    )
    spans = {r.doc_id: (r.span_start, r.span_end) for r in boilerplate_spans(docs, min_docs=3).collect()}
    keeps = {}
    for r in boilerplate_cut_plan(docs, min_docs=3).collect():
        keeps.setdefault(r.doc_id, []).append((r.keep_start, r.keep_end))
        assert r.n_toks_kept == r.keep_end - r.keep_start + 1 > 0
    n_toks = {1: 17, 2: 13, 3: 14, 4: 14, 5: 4}
    for d, n in n_toks.items():
        covered = set()
        for a, b in keeps.get(d, []):
            covered |= set(range(a, b + 1))
        if d in spans:
            a, b = spans[d]
            covered |= set(range(a, b + 1))
        assert covered == set(range(1, n + 1)), (d, sorted(covered))
    assert 2 not in keeps          # fully-boilerplate doc keeps nothing
    assert keeps[5] == [(1, 4)]    # clean doc keeps everything


def test_star_components_driver_and_distributed_paths_agree(spark):
    """The adaptive small-graph union-find and the distributed
    alternating-star rounds must emit the IDENTICAL (node, min) edge
    list — on a random graph with chains, cliques, singleton edges and
    string node ids."""
    import random

    from dr_source_spark.operators.graph import alternating_star_components

    rng = random.Random(7)
    edges = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}") for _ in range(80)]
    edges += [(f"c{i}", f"c{i+1}") for i in range(10)]  # a chain
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {tuple(r) for r in alternating_star_components(df).collect()}
    dist = {tuple(r) for r in alternating_star_components(df, driver_max_edges=0).collect()}
    assert fast == dist and len(fast) > 0


def test_funnel_progress_orders_steps_strictly(spark):
    from datetime import datetime

    from dr_source_spark.operators.relational import funnel_progress

    T = lambda m: datetime(2024, 1, 1, 12, m)
    ev = spark.createDataFrame(
        [
            # user 1: full ordered funnel
            (1, "view", T(0)), (1, "click", T(5)), (1, "purchase", T(10)),
            # user 2: purchase BEFORE click -> funnel stops at click? no:
            # click at 5, purchase at 3 (before click) -> purchase not counted
            (2, "view", T(0)), (2, "purchase", T(3)), (2, "click", T(5)),
            # user 3: click before any view -> only view counted
            (3, "click", T(0)), (3, "view", T(2)),
            # user 4: never viewed -> no row
            (4, "purchase", T(1)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    rows = {r.user_id: r for r in funnel_progress(ev).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].steps_completed == 3 and rows[1].ts_purchase == "2024-01-01 12:10:00"
    assert rows[2].steps_completed == 2 and rows[2].ts_purchase is None
    assert rows[3].steps_completed == 1 and rows[3].ts_click is None


def test_retention_cohorts_week_boundaries(spark):
    from datetime import datetime

    from dr_source_spark.operators.relational import retention_cohorts

    ev = spark.createDataFrame(
        [
            # user 1 first active Mon Jan 1 2024 week, returns 2 weeks later
            (1, datetime(2024, 1, 2, 10, 0)), (1, datetime(2024, 1, 16, 9, 0)),
            # user 2 same cohort, active only that week (twice -> one row)
            (2, datetime(2024, 1, 3, 10, 0)), (2, datetime(2024, 1, 7, 10, 0)),
            # user 3 joins the following week
            (3, datetime(2024, 1, 10, 10, 0)),
        ],
        "user_id long, ts timestamp",
    ).withColumn("event_type", F.lit("view"))
    out = {(r.cohort_week, r.week_offset): r.n_users for r in retention_cohorts(ev).collect()}
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_trailing_7d_range_frame_respects_gaps(spark):
    """RANGE (value) frame, not ROWS: a 10-day gap must NOT carry the old
    day into the trailing sum, and day 7 must drop day 0."""
    from datetime import datetime

    import __spark_entry__ as E

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9), 10.0),
            (1, datetime(2024, 1, 7, 9), 1.0),   # within 7d of Jan 1
            (1, datetime(2024, 1, 8, 9), 2.0),   # Jan 1 now out of range
            (1, datetime(2024, 1, 20, 9), 5.0),  # isolated after a gap
        ],
        "user_id long, ts timestamp, value double",
    ).withColumn("event_type", F.lit("view")).withColumn("event_id", F.lit(0)).withColumn("props", F.lit(""))
    import tempfile, os
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.day: (r.n_7d, r.value_7d) for r in E.queries()["events_trailing_7d"](spark, d).collect()}
    assert out["2024-01-01"] == (1, 10.0)
    assert out["2024-01-07"] == (2, 11.0)
    assert out["2024-01-08"] == (2, 3.0)
    assert out["2024-01-20"] == (1, 5.0)


def test_final_keep_list_precedence(spark):
    from dr_source_spark.training.curate import final_keep_list

    prose = "the cat and the dog sat in the house of it is that day"
    docs = spark.createDataFrame(
        [
            (1, prose),            # canonical + quality -> kept
            (2, prose),            # exact dup of 1 -> near_duplicate
            (3, "tiny doc"),       # too_short
            (4, "xy zz qq ww ee rr tt yy uu ii"),  # no stopwords
            (5, None),             # NULL -> too_short (never escapes)
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.reason, r.keep) for r in final_keep_list(docs).collect()}
    assert rows[1] == ("kept", True)
    assert rows[2] == ("near_duplicate", False)
    assert rows[3] == ("too_short", False)
    assert rows[4] == ("low_stopword_ratio", False)
    assert rows[5] == ("too_short", False)
    assert len(rows) == 5


def test_asof_join_edge_semantics(spark):
    """Inclusive at equal ts; NULL before any right row; later right rows
    invisible; carries across gaps."""
    from datetime import datetime

    from dr_source_spark.operators.asof import asof_join

    T = lambda m: datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, 10, T(0)), (2, 10, T(5)), (3, 10, T(30)), (4, 20, T(1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, T(5), 1.5), (10, T(20), 2.5), (20, T(2), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {r.event_id: (r.asof_ts, r.asof_value) for r in asof_join(left, right).collect()}
    assert out[1] == (None, None)          # before any signup
    assert out[2] == (T(5), 1.5)           # equal ts -> inclusive
    assert out[3] == (T(20), 2.5)          # latest prior, not first
    assert out[4] == (None, None)          # right row is LATER -> invisible


def test_interval_bucket_join_exact_pairs(spark):
    """Bucketized pairs equal the brute-force BETWEEN join, including
    boundary-inclusive matches and intervals spanning many buckets."""
    from dr_source_spark.operators.rangejoin import interval_bucket_join

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 30.0), (3, 31.5), (4, 100.0), (5, 64.0)],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 30.0), (11, 30.0, 35.0), (12, 0.0, 200.0), (13, 64.0, 64.0)],
        "iid long, lo double, hi double",
    )
    got = {(r.pid, r.iid) for r in interval_bucket_join(pts, ivs, value_col="v").collect()}
    want = {
        (p, i)
        for p, v in [(1, 0.0), (2, 30.0), (3, 31.5), (4, 100.0), (5, 64.0)]
        for i, lo, hi in [(10, 0.0, 30.0), (11, 30.0, 35.0), (12, 0.0, 200.0), (13, 64.0, 64.0)]
        if lo <= v <= hi
    }
    assert got == want


def test_hypertable_rollup_day_from_hour_partials(spark):
    from datetime import datetime

    from dr_source_spark.operators.relational import hypertable_rollup

    ev = spark.createDataFrame(
        [
            ("click", datetime(2024, 1, 1, 10, 5), 1.0),
            ("click", datetime(2024, 1, 1, 10, 55), 2.0),
            ("click", datetime(2024, 1, 1, 23, 0), 4.0),
            ("click", datetime(2024, 1, 2, 0, 0), 8.0),
        ],
        "event_type string, ts timestamp, value double",
    ).withColumn("event_id", F.lit(0)).withColumn("user_id", F.lit(1)).withColumn("props", F.lit(""))
    out = {(r.granularity, r.bucket_start): (r.n_events, r.sum_value)
           for r in hypertable_rollup(ev).collect()}
    assert out[("hour", "2024-01-01 10:00:00")] == (2, 3.0)
    assert out[("hour", "2024-01-01 23:00:00")] == (1, 4.0)
    assert out[("day", "2024-01-01 00:00:00")] == (3, 7.0)
    assert out[("day", "2024-01-02 00:00:00")] == (1, 8.0)


def test_substring_cut_plan_merges_overlaps_and_targets_later_doc(spark):
    from dr_source_spark.training.dedup import substring_cut_plan

    p = lambda a, b: " ".join(f"w{i}" for i in range(a, b))
    docs = spark.createDataFrame(
        [
            (1, p(0, 30)),                       # canonical: never cut
            (2, p(0, 30) + " xa xb"),            # shares [0,30) with 1
            (3, p(10, 30) + " yy " + p(0, 8)),   # shares [10,30) and [0,8) with 1
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    rows = {(r.doc_id, r.cut_start, r.cut_end): r.n_toks_cut
            for r in substring_cut_plan(docs, cands, min_span=6).collect()}
    # doc 1 (earlier) never cut; doc 2 loses its 30-token copy; doc 3
    # loses its longest span [0..19] (the 20-token run); the 8-token span
    # is a separate pair-best only if longer — here the 20-token one wins
    assert all(d != 1 for d, _, _ in rows)
    assert rows[(2, 0, 29)] == 30
    assert rows[(3, 0, 19)] == 20


def test_dimension_stats_flags_dead_and_saturated(spark):
    from dr_source_spark.training.similarity import dimension_stats

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.5]),
            (2, [-1.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r.dim: r for r in dimension_stats(emb).collect()}
    assert rows[1].min_q == rows[1].max_q == rows[1].sum_q == rows[1].sum_sq == 0  # dead dim
    assert rows[0].min_q == -127 and rows[0].max_q == 127  # saturated
    assert rows[2].sum_sq == 64 * 64 + 127 * 127  # 0.5/scale=64 (rounded), 1.0 -> 127


def test_bigram_diversity_orders_spam_below_prose(spark):
    from dr_source_spark.training.text import bigram_diversity

    docs = spark.createDataFrame(
        [
            (1, "ha" * 50),                     # repetitive spam
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "x"),                           # too short: no row
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_diversity(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].diversity < rows[2].diversity
    assert rows[1].n_distinct == 2  # 'ha' and 'ah'
    assert rows[1].n_bigrams == 99


# ---------------------------------------------------------------------------
# One-permutation hashing (OPH) — the 5.3x-cheaper signature family
# (tools/minhash_ab.py measurement; see _oph_dense for the plan shape)


def test_oph_signatures_match_python_model(spark):
    """Cell-exact vs an independent pure-Python OPH model, including the
    rotation-densification fill and its cyclic wrap (the single-token doc
    exercises wrap: every bin past the token's borrows around the end)."""
    import hashlib

    from dr_source_spark.training.dedup import oph_signatures

    nb = 8
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta"),
            (4, None),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.seed): r.minhash for r in oph_signatures(docs, num_bins=nb).collect()}

    def base(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)

    def model(words):
        bins = {}
        for w in set(words):
            h = base(w.lower())
            bins[h % nb] = min(bins.get(h % nb, h), h)
        return {
            i: next(bins[(i + d) % nb] for d in range(nb) if (i + d) % nb in bins)
            for i in range(nb)
        }

    exp = {}
    for did, words in [(1, "alpha beta gamma delta".split()), (2, "alpha beta gamma delta".split()), (3, ["zeta"])]:
        for s, v in model(words).items():
            exp[(did, s)] = v
    assert got == exp
    # token-free docs emit no signature, as in the classic family
    assert all(k[0] not in (4, 5) for k in got)


def test_oph_lsh_recall_matches_classic_on_long_docs(spark):
    """OPH's intended domain is long documents (token count >= num_bins,
    so bins are genuinely filled, not densified). On 400-token docs with
    planted ~J0.9 near-dup groups, OPH candidates must recover every true
    pair — same quality as the classic family at ~5x less signature CPU.
    (On short-doc corpora the estimator degrades — measured recall 0.82 vs
    classic 0.99 at J>=0.8 on the ~25-token sf0.01 docs — which is why the
    oph_sparse observe metric exists; see test below.)"""
    import random

    from dr_source_spark.training.dedup import minhash_lsh_candidates, oph_lsh_candidates

    rng = random.Random(7)
    vocab = [f"w{i:04d}" for i in range(5000)]
    rows, truth, did = [], set(), 0
    for _ in range(20):  # base + 2 near-dups (~J0.9) + 2 unrelated per group
        bases = rng.sample(vocab, 400)
        rows.append((did, " ".join(bases)))
        a = did
        did += 1
        for _ in range(2):
            mut = bases.copy()
            for k in rng.sample(range(400), 20):
                mut[k] = rng.choice(vocab)
            rows.append((did, " ".join(mut)))
            truth.add((a, did))
            did += 1
        for _ in range(2):
            rows.append((did, " ".join(rng.sample(vocab, 400))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oph = {(r.doc_a, r.doc_b) for r in oph_lsh_candidates(docs).collect()}
    assert truth <= oph, f"missed {len(truth - oph)} true pairs"
    # and the S-curve still rejects non-duplicates: candidate set stays
    # near the true near-dup set (base-dup pairs + dup-dup pairs), not
    # the ~5k all-pairs blowup the pre-striding consecutive bands showed
    assert len(oph) <= 3 * len(truth)
    classic = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
    assert truth <= classic  # sanity: same gate the classic family passes


def test_oph_sparse_corpus_observably_flagged(spark):
    """Docs with fewer real bins than num_bins/2 are counted by an in-plan
    observe metric riding every OPH materialization — the short-doc bias
    is measurable in production, never silent."""
    from dr_source_spark.training.dedup import oph_signatures

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, " ".join(f"t{i}" for i in range(64)))],
        "doc_id long, text string",
    )
    sigs = oph_signatures(docs, num_bins=16)
    # collect() (not count()) so the metric is read off THIS DataFrame's
    # own query execution — count() plans a separate execution
    assert len(sigs.collect()) == 32
    jqe = sigs._jdf.queryExecution()
    it = jqe.observedMetrics().iterator()
    metrics = {}
    while it.hasNext():
        kv = it.next()
        metrics[kv._1()] = kv._2()
    row = next(v for k, v in metrics.items() if k.startswith("oph_sparse"))
    # doc 1 has 3 tokens -> <8 real bins (sparse); doc 2 has 64 tokens
    # hitting >=8 of 16 bins w.h.p. under md5 (deterministic here)
    assert row.getLong(0) == 1 and row.getLong(1) == 2


def _idocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_incremental_dedup_planted_duplicate_rejected(spark):
    """A new doc that near-duplicates an index doc is rejected with the
    index doc as best match; an unrelated new doc is admitted with zero
    candidates and NULL best columns."""
    from dr_source_spark.training.dedup import incremental_dedup_decisions

    body = " ".join(f"tok{i}" for i in range(40))
    index = _idocs(spark, [(1, body, "aa"), (2, "совершенно другой текст", "aa")])
    new = _idocs(
        spark,
        [(100, body + " extra", "aa"), (101, "nothing in common here at all", "aa")],
    )
    got = {r.doc_id: r for r in incremental_dedup_decisions(index, new).collect()}
    assert got[100].verdict == "duplicate" and got[100].best_match_id == 1
    # J = 40/41 -> integer pct 97
    assert got[100].best_jaccard_pct == 97 and got[100].n_candidates == 1
    assert got[101].verdict == "admitted" and got[101].n_candidates == 0
    assert got[101].best_match_id is None and got[101].best_jaccard_pct is None


def test_incremental_dedup_tie_breaks_to_lowest_index_id(spark):
    """Two index docs with IDENTICAL text give equal Jaccard: best match
    must deterministically be the lower doc_id."""
    from dr_source_spark.training.dedup import incremental_dedup_decisions

    body = " ".join(f"w{i}" for i in range(30))
    index = _idocs(spark, [(7, body, "aa"), (3, body, "aa")])
    new = _idocs(spark, [(50, body, "aa")])
    r = incremental_dedup_decisions(index, new).collect()[0]
    assert r.n_candidates == 2 and r.best_match_id == 3
    assert r.best_jaccard_pct == 100 and r.verdict == "duplicate"


def test_incremental_dedup_below_threshold_admitted_with_match(spark):
    """A candidate that collides in a band but verifies below the
    threshold is admitted — with the match still reported (audit trail)."""
    from dr_source_spark.training.dedup import incremental_dedup_decisions

    shared = " ".join(f"s{i}" for i in range(16))
    index = _idocs(spark, [(1, shared + " " + " ".join(f"ix{i}" for i in range(20)), "aa")])
    new = _idocs(spark, [(60, shared + " " + " ".join(f"nw{i}" for i in range(20)), "aa")])
    rows = incremental_dedup_decisions(index, new, threshold_pct=70).collect()
    r = rows[0]
    assert r.verdict == "admitted"
    if r.n_candidates:  # banding may or may not collide at J=16/56
        assert r.best_jaccard_pct < 70 and r.best_match_id == 1


def test_incremental_dedup_token_free_new_doc_admitted(spark):
    """NULL/empty-text new docs emit no signature, hence no candidates —
    they are admitted rows, never dropped (every new doc gets a verdict)."""
    from dr_source_spark.training.dedup import incremental_dedup_decisions

    index = _idocs(spark, [(1, "some index text here", "aa")])
    new = _idocs(spark, [(70, None, "aa"), (71, "   ", "aa")])
    got = {r.doc_id: r.verdict for r in incremental_dedup_decisions(index, new).collect()}
    assert got == {70: "admitted", 71: "admitted"}


def test_incremental_dedup_hot_index_group_capped(spark):
    """An index band-signature group larger than max_cluster is excluded
    from candidate generation (deterministically, like the batch LSH cap):
    a new doc identical to the viral cluster comes back admitted."""
    from dr_source_spark.training.dedup import incremental_dedup_decisions

    body = " ".join(f"viral{i}" for i in range(25))
    index = _idocs(spark, [(i, body, "aa") for i in range(1, 6)])
    new = _idocs(spark, [(90, body, "aa")])
    r = incremental_dedup_decisions(index, new, max_cluster=3).collect()[0]
    assert r.verdict == "admitted" and r.n_candidates == 0
    # and with the cap lifted the same doc is a duplicate of doc 1
    r2 = incremental_dedup_decisions(index, new, max_cluster=0).collect()[0]
    assert r2.verdict == "duplicate" and r2.best_match_id == 1 and r2.n_candidates == 5


def test_importance_select_separates_target_like_from_raw_like(spark):
    """DSIR-style selection: a raw doc written in the target vocabulary
    is selected; a raw doc in vocabulary the target never uses is
    rejected (its buckets carry only smoothed raw mass, weight < 1.0)."""
    from dr_source_spark.training.select import importance_select

    tvocab = " ".join(f"target{i}" for i in range(30))
    rvocab = " ".join(f"rawonly{i}" for i in range(30))
    target = _idocs(spark, [(i, tvocab, "aa") for i in range(5)])
    raw = _idocs(spark, [(100, tvocab, "aa"), (101, rvocab, "aa")])
    got = {r.doc_id: r for r in importance_select(target, raw).collect()}
    assert got[100].verdict == "selected" and got[101].verdict == "rejected"
    assert got[100].avg_weight > got[101].avg_weight
    assert got[100].n_grams == 30 and got[101].n_grams == 30


def test_importance_select_null_text_rejected_with_row(spark):
    """Token-free raw docs still get a verdict row: n_grams 0, NULL
    score columns, 'rejected' — no doc silently vanishes from selection."""
    from dr_source_spark.training.select import importance_select

    target = _idocs(spark, [(1, "some target words here", "aa")])
    raw = _idocs(spark, [(50, None, "aa"), (51, "  ", "aa")])
    rows = {r.doc_id: r for r in importance_select(target, raw).collect()}
    for d in (50, 51):
        assert rows[d].verdict == "rejected" and rows[d].n_grams == 0
        assert rows[d].score is None and rows[d].avg_weight is None


def test_importance_weights_match_python_model(spark):
    """The weight table holds exactly `buckets` rows and every weight
    obeys the fixed-point smoothed-ratio law vs a pure-Python recount."""
    import hashlib

    from dr_source_spark.training.select import importance_weights

    target = _idocs(spark, [(1, "alpha beta beta", "aa")])
    raw = _idocs(spark, [(2, "alpha gamma gamma gamma", "aa")])
    B = 16
    rows = importance_weights(target, raw, buckets=B).collect()
    assert len(rows) == B and sorted(r.bucket for r in rows) == list(range(B))

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    nt, nr = [0] * B, [0] * B
    for w in "alpha beta beta".split():
        nt[bucket(w)] += 1
    for w in "alpha gamma gamma gamma".split():
        nr[bucket(w)] += 1
    tt, rt = sum(nt), sum(nr)
    for r in rows:
        assert r.n_target == nt[r.bucket] and r.n_raw == nr[r.bucket]
        # size-normalized smoothed frequency ratio, staged integer div
        assert r.weight == (
            (65536 * (r.n_target + 1) // (tt + B)) * (rt + B) // (r.n_raw + 1)
        )


def test_mix_plan_known_budget_arithmetic(spark):
    """Equal-share budgeting on a tiny known corpus: the oversized
    domain downsamples, the undersized one repeats, and a token-free
    domain pins rate and epochs to 0."""
    from dr_source_spark.training.select import mix_plan

    docs = _idocs(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(10)), "big"),
            (2, "x y z", "small"),
            (3, None, "empty"),
        ],
    )
    got = {r.grp: r for r in mix_plan(docs, token_budget=12).collect()}
    assert got["big"].quota == got["small"].quota == got["empty"].quota == 4
    assert got["big"].n_tokens == 10 and got["big"].rate_ppm == 400000
    assert got["big"].epochs == 1
    assert got["small"].n_tokens == 3 and got["small"].rate_ppm == 1000000
    assert got["small"].epochs == 2  # ceil(4 / 3)
    assert got["empty"].n_tokens == 0 and got["empty"].rate_ppm == 0
    assert got["empty"].epochs == 0


def test_pagerank_driver_path_bit_equal_to_distributed(spark):
    """The adaptive driver short-circuit and the distributed fixed-point
    loop must agree BIT-EXACTLY (integer sums are order-free, so there is
    no tolerance — equality or bug), on a graph with dangling nodes,
    multi-in-degree hubs, and an isolated 2-cycle."""
    from dr_source_spark.operators.graph import pagerank_fixed_point

    edge_list = [
        ("a", "b"), ("b", "c"), ("a", "c"), ("d", "a"),
        ("x", "y"), ("y", "x"),
        ("c", "a"),  # cycle back so mass circulates
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    fast = {r.node: r.rank for r in pagerank_fixed_point(edges, iterations=8).collect()}
    slow = {
        r.node: r.rank
        for r in pagerank_fixed_point(edges, iterations=8, driver_max_edges=0).collect()
    }
    assert fast == slow and len(fast) == 6


def test_pagerank_numpy_loop_bit_equal_to_python_reference():
    """The vectorized int64 driver loop (round-6 optimization) must equal
    the pure-Python integer reference bit-for-bit on a random multigraph
    with dangling nodes, hubs, and self-loops — and on string node ids
    (the KG edge shape). No Spark session needed."""
    import random

    from dr_source_spark.operators.graph import _driver_pagerank, _driver_pagerank_rows

    random.seed(13)
    edges = list({(random.randrange(500), random.randrange(500)) for _ in range(3000)})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n, scale, dp = len(nodes), 10**12, 85
    base = (scale * (100 - dp)) // (100 * n)
    assert _driver_pagerank_rows(edges, 10, scale, dp) == _driver_pagerank(
        edges, 10, scale, dp, n, base
    )
    sedges = [(f"n{s}", f"n{d}") for s, d in edges]
    sn = sorted({a for a, _ in sedges} | {b for _, b in sedges})
    sbase = (scale * (100 - dp)) // (100 * len(sn))
    assert _driver_pagerank_rows(sedges, 10, scale, dp) == _driver_pagerank(
        sedges, 10, scale, dp, len(sn), sbase
    )
    # past the int64 headroom the rows entry must fall back to the
    # arbitrary-precision loop and still validate the scale floor
    big = 10**17
    assert _driver_pagerank_rows(edges, 3, big, dp) == _driver_pagerank(
        edges, 3, big, dp, n, (big * (100 - dp)) // (100 * n)
    )


def test_bfs_driver_path_identical_to_distributed(spark):
    """The adaptive driver BFS and the distributed frontier loop must
    return the identical (node, hops) set — min-hop labels are order-free
    — including seeds-only components, unreachable nodes (absent), and
    the max_hops cutoff."""
    from dr_source_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("d", "e"), ("e", "f")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("x",)], "node string")
    for hops in (2, 6):
        fast = {(r.node, r.hops) for r in bfs_distances(edges, seeds, max_hops=hops).collect()}
        slow = {
            (r.node, r.hops)
            for r in bfs_distances(edges, seeds, max_hops=hops, driver_max_edges=0).collect()
        }
        assert fast == slow
    assert ("f", 5) in fast and ("y", 1) in fast


def test_shingle_mode_token_free_docs_emit_no_signature(spark):
    """The no-signature-for-token-free-docs invariant holds in SHINGLE
    mode too: NULL/empty/whitespace texts must emit zero signature rows
    (the ungated substr walk emitted [''] for empty text — making all
    empty docs certain near-dup candidates of each other — and a
    NULL-minhash row for NULL text)."""
    from dr_source_spark.training.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "hello world of shingles"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=4, shingle_n=5).collect()
    assert {r.doc_id for r in sigs} == {1}
    assert all(r.minhash is not None for r in sigs) and len(sigs) == 4


def test_label_propagation_keeps_self_loop_only_nodes(spark):
    """A node whose only edges are self-loops has no neighbors after the
    simple-graph filter but must still get a label row (its own id) —
    it was silently omitted before."""
    from dr_source_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("x", "x"), ("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r.node: r.label for r in label_propagation(edges, rounds=2).collect()}
    assert set(got) == {"x", "a", "b", "c"}
    assert got["x"] == "x"


def test_sample_stratified_rate_bounds(spark):
    """rate >= 1.0 keeps the whole stratum unconditionally (the strict
    u < 'ffffffff' compare dropped md5-prefix-ffffffff docs); rate <= 0
    drops the stratum entirely."""
    from dr_source_spark.training.text import sample_stratified

    docs = spark.createDataFrame(
        [(i, "t", "en") for i in range(50)] + [(100 + i, "t", "de") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    kept = sample_stratified(docs, {"en": 1.0, "de": 0.0}).collect()
    assert len(kept) == 50 and all(r.lang == "en" for r in kept)
    assert sample_stratified(docs, {"en": 0.0}).count() == 0


def test_quality_score_blank_docs_count_zero_tokens(spark):
    """Blank/NULL docs report 0 tokens, agreeing with token_count's
    regexp-based count (the [''] split artifact reported 1)."""
    from dr_source_spark.training.text import quality_score

    docs = spark.createDataFrame(
        [(1, "two words", "en"), (2, "   ", "en"), (3, None, "en")],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r for r in quality_score(docs).collect()}
    assert got[1].n_tokens == 2
    assert got[2].n_tokens == 0 and got[3].n_tokens == 0


def test_exact_duplicates_groups_null_with_empty_text(spark):
    """exact_duplicates and curation_decisions share one normalization:
    NULL text fingerprints as '' and groups with empty docs — previously
    NULL docs formed a separate NULL-key group, so the canonical sets of
    the two surfaces disagreed."""
    from dr_source_spark.training.curate import curation_decisions
    from dr_source_spark.training.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "real text here")], "doc_id long, text string"
    )
    groups = exact_duplicates(docs).collect()
    by_canon = {r.canonical_id: r.dup_count for r in groups}
    assert by_canon == {1: 2, 3: 1}
    cur = {r.doc_id: r.reason for r in curation_decisions(docs).collect()}
    assert cur[2] == "exact_duplicate"  # same canonical choice: doc 1


def _py_hyperball_regs(members, p=4):
    """Pure-Python register sketch of a member SET — the ground truth the
    HyperBall propagation law is checked against (same md5-prefix hash,
    bucket = low bits, rho = leading-zero rank of the rest)."""
    import hashlib

    m = 1 << p
    maxrho = 32 - p + 1
    out = {}
    for mem in members:
        h = int(hashlib.md5(str(mem).encode()).hexdigest()[:8], 16)
        b = h % m
        rem = h // m
        rho = maxrho if rem == 0 else (32 - p) - rem.bit_length() + 1
        out[b] = max(out.get(b, 0), rho)
    return out


def test_hyperball_registers_equal_ball_sketch_law(spark):
    """The HyperBall law: after t rounds of max-merge propagation the
    register table of node v EQUALS the sketch of v's exact <=t-hop ball
    computed as a set — path multiplicity and merge order cannot perturb
    a max. Checked register-for-register on a graph with a cycle (path
    multiplicity), a hub, and an isolated node."""
    from dr_source_spark.operators.graph import hyperball_registers

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (4, 6), (4, 7), (8, 8)]
    sym = [(a, b) for a, b in und if a != b]
    sym += [(b, a) for a, b in sym]
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    all_nodes = sorted({n for e in und for n in e})
    edges = spark.createDataFrame(sym, "src long, dst long")
    nodes = spark.createDataFrame([(n,) for n in all_nodes], "node long")
    got = {}
    for r in hyperball_registers(edges, nodes, p=4, rounds=2).collect():
        got.setdefault(r.node, {})[r.bucket] = r.r
    for v in all_nodes:
        ball = {v} | adj.get(v, set())
        ball = ball | {w for u in ball for w in adj.get(u, set())}
        assert got[v] == _py_hyperball_regs(ball), (v, ball)


def test_hyperball_neighborhoods_known_graph(spark):
    """Path 1-2-3-4-5 + isolated 6: exact ball sizes, doubled harmonic
    centrality, and the register-summary invariants (used+zero = m,
    harmonic_scaled counts every register exactly once)."""
    from dr_source_spark.operators.graph import hyperball_neighborhoods

    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")
    nodes = spark.createDataFrame([(n,) for n in range(1, 7)], "node long")
    rows = {r.node: r for r in hyperball_neighborhoods(edges, nodes, p=4).collect()}
    assert len(rows) == 6
    expect = {  # node: (ball1, ball2, harmonic_x2)
        1: (2, 3, 3), 2: (3, 4, 5), 3: (3, 5, 6),
        4: (3, 4, 5), 5: (2, 3, 3), 6: (1, 1, 0),
    }
    for n, (b1, b2, hx2) in expect.items():
        r = rows[n]
        assert (r.ball1_exact, r.ball2_exact, r.harmonic_x2) == (b1, b2, hx2), (n, r)
        assert r.m == 16 and r.used_regs + r.zero_regs == 16
        # every used register contributes 2^(29-r) < 2^29; every zero
        # register exactly 2^29 — so the scaled harmonic sum is bounded
        assert r.zero_regs * (1 << 29) < r.harmonic_scaled <= 16 * (1 << 29)
    # isolated node: sketch of {6} alone — exactly one used register
    assert rows[6].used_regs == 1
    exp6 = _py_hyperball_regs({6})
    assert rows[6].sum_rho == sum(exp6.values())


def test_personalized_pagerank_parity_and_semantics(spark):
    """Driver and distributed PPR paths are BIT-EXACT on the same graph;
    mass concentrates on/near the seeds (restart goes to seeds only) and
    non-seed rank decays with distance; a seed off the edge node set is
    ignored and an empty effective seed set raises."""
    import pytest

    from dr_source_spark.operators.graph import personalized_pagerank

    # NON-bipartite on purpose: a bipartite path makes the 8-round walk
    # oscillate between parity classes (period-2), so per-node ordering
    # assertions would test the iteration count, not the operator. The
    # triangle s-a-b plus pendant chain b-c-d converges.
    und = [("s", "a"), ("s", "b"), ("a", "b"), ("b", "c"), ("c", "d")]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    seeds = spark.createDataFrame([("s",), ("zzz-not-in-graph",)], "node string")
    drv = {r.node: r.rank for r in personalized_pagerank(edges, seeds).collect()}
    dist = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, driver_max_edges=0).collect()
    }
    assert drv == dist  # bit-exact across the two execution paths
    # seed holds the most mass; rank decays down the pendant chain
    assert drv["s"] > drv["b"] and drv["a"] > drv["c"] > drv["d"] > 0
    # fixed-point floors dissipate only a ~1e-10 fraction of the mass
    assert 0.999 * 10**12 < sum(drv.values()) <= 10**12
    with pytest.raises(ValueError):
        personalized_pagerank(
            edges, spark.createDataFrame([("nope",)], "node string")
        )


def test_session_stats_known_timeline(spark):
    """Hand-built timeline: user 1 has two sessions (a 31-min gap splits,
    an exactly-30-min gap does NOT — the strictly-greater rule matches
    stream_sessionize); user 2 has one single-event session."""
    import datetime as dt

    from dr_source_spark.operators.relational import session_stats

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),      # ==30min gap: same session
        (1, t0 + dt.timedelta(minutes=61, seconds=1)),  # >30min: new session
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.user_id: r for r in session_stats(df).collect()}
    assert got[1].n_sessions == 2 and got[1].n_events == 3
    assert got[1].max_session_events == 2
    assert got[1].longest_session_secs == 1800
    assert got[2].n_sessions == 1 and got[2].longest_session_secs == 0


def test_zscore_outlier_counts_known_values(spark):
    """Hand-checkable: user 1 has fifteen 10.0s and one 100.0 — the spike
    is > 3 sigma out (a lone spike among n points caps at z ~ sqrt(n), so
    9+1 would land at EXACTLY 3.0 and the strict inequality correctly
    rejects it — 15+1 clears the bar); user 2's uniform values yield zero
    outliers; a single-event user yields zero (deviation and variance
    both zero, 0 > 0 is false)."""
    from dr_source_spark.operators.relational import zscore_outlier_counts

    rows = [(1, 10.0)] * 15 + [(1, 100.0)] + [(2, 5.0)] * 4 + [(3, 42.0)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = {r.user_id: (r.n_events, r.n_outliers) for r in zscore_outlier_counts(df).collect()}
    # verify the flag against the pure-Python integer inequality
    vs = [100_000] * 15 + [1_000_000]
    n, s1 = len(vs), sum(vs)
    s2 = sum(v * v for v in vs)
    spike_out = (n * 1_000_000 - s1) ** 2 > 9 * (n * s2 - s1 * s1)
    base_out = (n * 100_000 - s1) ** 2 > 9 * (n * s2 - s1 * s1)
    assert spike_out and not base_out  # the fixture is what we think it is
    assert got == {1: (16, 1), 2: (4, 0), 3: (1, 0)}


def test_hyperball_law_holds_with_partial_node_table(spark):
    """An edge endpoint missing from the caller's node table must not
    break the registers == sketch(exact ball) law: both halves normalize
    to nodes UNION endpoints (a missing endpoint previously got phantom
    registers on one side and a counted membership on the other)."""
    from dr_source_spark.operators.graph import (
        exact_ball,
        hyperball_registers,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(1,)], "node long")  # node 2 omitted
    got = {}
    for r in hyperball_registers(edges, nodes, p=4, rounds=2).collect():
        got.setdefault(r.node, {})[r.bucket] = r.r
    balls = {}
    for r in exact_ball(edges, nodes, hops=2).collect():
        balls.setdefault(r.node, set()).add(r.member)
    assert set(got) == {1, 2} and balls == {1: {1, 2}, 2: {1, 2}}
    for v, ball in balls.items():
        assert got[v] == _py_hyperball_regs(ball), (v, ball)


def test_new_ops_empty_and_null_inputs(spark):
    """Empty/NULL-input gates for the final-session operators, matching
    the house convention the sketches follow: empty in, empty (not
    crash) out; NULL ts/value rows are DROPPED (Spark and DuckDB order
    NULLs on opposite ends, and count(*) would diverge from NULL-skipping
    sums), pinned here so the hardening cannot regress silently."""
    import datetime as dt

    from dr_source_spark.operators.graph import (
        hyperball_neighborhoods,
        personalized_pagerank,
    )
    from dr_source_spark.operators.relational import (
        session_stats,
        zscore_outlier_counts,
    )

    empty_edges = spark.createDataFrame([], "src long, dst long")
    empty_nodes = spark.createDataFrame([], "node long")
    assert hyperball_neighborhoods(empty_edges, empty_nodes).count() == 0

    empty_events = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert session_stats(empty_events).count() == 0
    assert zscore_outlier_counts(empty_events).count() == 0

    # PPR on empty edges: no node can intersect the seed set -> ValueError
    import pytest

    with pytest.raises(ValueError):
        personalized_pagerank(empty_edges, spark.createDataFrame([(1,)], "node long"))

    # NULL-row drop: the NULL-ts event joins no session; the NULL-value
    # event counts toward neither n_events nor the sums
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [(1, t0, 5.0), (1, t0 + dt.timedelta(minutes=5), 7.0), (1, None, 9.0)],
        "user_id long, ts timestamp, value double",
    )
    s = session_stats(ev).collect()[0]
    assert (s.n_sessions, s.n_events) == (1, 2)
    ev2 = spark.createDataFrame(
        [(1, t0, 5.0), (1, t0, None)], "user_id long, ts timestamp, value double"
    )
    z = zscore_outlier_counts(ev2).collect()[0]
    assert (z.n_events, z.n_outliers) == (1, 0)


def test_pq_assign_seeds_self_assign_and_neighbors_follow(spark):
    from dr_source_spark.training.similarity import pq_assign

    # seeds are the 2 smallest vec_ids (codes 0,1). Vector 0 and 1 must
    # assign to themselves (dist 0 in every subspace); vector 2 is a
    # tiny perturbation of vector 1 -> code 1 in both subspaces; vector
    # 3 mixes halves -> code 0 in subspace 0, code 1 in subspace 1.
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.9, 1.1, 1.0, 0.9]),
        (3, [0.1, 0.0, 1.0, 1.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r.vec_id, r.subspace): (r.code, r.dist2_q)
           for r in pq_assign(emb, n_subspaces=2, n_centroids=2).collect()}
    assert len(out) == 8
    for sub in (0, 1):
        assert out[(0, sub)] == (0, 0)
        assert out[(1, sub)] == (1, 0)
        assert out[(2, sub)][0] == 1
    assert out[(3, 0)][0] == 0 and out[(3, 1)][0] == 1


def test_pq_assign_ties_break_to_smallest_code(spark):
    from dr_source_spark.training.similarity import pq_assign

    # two identical seed vectors -> every distance ties -> code 0 wins
    rows = [(0, [0.5, 0.5]), (1, [0.5, 0.5]), (2, [0.4, 0.6])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_assign(emb, n_subspaces=1, n_centroids=2).collect()
    assert all(r.code == 0 for r in out)
