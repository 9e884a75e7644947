"""Gates for the deterministic sketch family (training/sketch.py):
KMV distinct-count, HyperLogLog registers, count-min heavy hitters.

Each sketch is checked three ways: cell-exact against an independent
pure-Python model (including the edge conventions — small-set KMV
fallback, HLL zero registers, CMS collision inflation), an accuracy
property proving the estimator actually estimates, and the structural
invariants a consumer relies on (cms_est >= exact_cnt, harmonic bounds).
The DuckDB value-hash oracles live in __spark_entry__ (text_kmv_distinct,
text_hll_registers, text_cms_heavy_hitters)."""

import hashlib

import pytest

from dr_source_spark.training.sketch import cms_heavy_hitters, hll_registers, kmv_distinct


def _base(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_kmv_matches_python_model_including_small_groups(spark):
    """Cell-exact vs a brute-force model. Group 'aa' has thousands of
    distinct tokens (> k, exercises the two-stage prune and the integer
    division); group 'bb' has 3 (< k, exercises the exact-count
    fallback)."""
    k = 16
    big = [(i, " ".join(f"tok{i}_{j}" for j in range(40)), "aa") for i in range(50)]
    small = [(1000, "x y z", "bb")]
    got = {r.grp: r for r in kmv_distinct(_docs(spark, big + small), k=k).collect()}

    for grp, words in [
        ("aa", {f"tok{i}_{j}" for i in range(50) for j in range(40)}),
        ("bb", {"x", "y", "z"}),
    ]:
        hs = sorted({_base(w) for w in words})
        kept = hs[:k]
        r = got[grp]
        assert r.k == k and r.n_kept == len(kept) and r.kth_hash == kept[-1]
        exp = len(kept) if len(kept) < k else (k - 1) * (1 << 32) // kept[-1]
        assert r.est_distinct == exp


def test_kmv_estimates_cardinality(spark):
    """The estimator is an estimator: on ~6000 distinct uniform tokens
    with k=64 the relative error should be well inside 3/sqrt(k) ~ 37%
    (deterministic corpus, so this is a fixed number, not a flaky gate)."""
    rows = [(i, " ".join(f"w{i * 60 + j:05d}" for j in range(60)), "xx") for i in range(100)]
    row = kmv_distinct(_docs(spark, rows), k=64).collect()[0]
    n_true = 6000
    assert abs(row.est_distinct - n_true) / n_true < 0.37, row.est_distinct


def test_hll_registers_match_python_model(spark):
    """Cell-exact register summary vs an independent model, p=6. The
    model rebuilds buckets/rho from the same md5 base hash and checks
    every emitted integer, including the scaled harmonic sum with its
    zero-register contribution."""
    p, m, maxrho = 6, 64, 27
    words = {f"t{i}" for i in range(300)}
    rows = [(0, " ".join(sorted(words)), "aa")]
    got = hll_registers(_docs(spark, rows), p=p).collect()
    assert len(got) == 1
    r = got[0]

    regs = {}
    for w in words:
        h = _base(w)
        rem = h >> p
        rho = maxrho if rem == 0 else (32 - p) - rem.bit_length() + 1
        b = h % m
        regs[b] = max(regs.get(b, 0), rho)
    zero = m - len(regs)
    harm = sum(1 << (maxrho - v) for v in regs.values()) + zero * (1 << maxrho)
    assert (r.m, r.used_regs, r.zero_regs, r.sum_rho, r.harmonic_scaled) == (
        m, len(regs), zero, sum(regs.values()), harm,
    )


def test_hll_estimates_cardinality(spark):
    """Applying the read-time alpha correction to the exact integer
    summary estimates the true distinct count within the expected
    ~1.04/sqrt(64) = 13% band (deterministic corpus => fixed number)."""
    rows = [(i, " ".join(f"u{i * 50 + j:05d}" for j in range(50)), "xx") for i in range(80)]
    r = hll_registers(_docs(spark, rows), p=6).collect()[0]
    m, maxrho = 64, 27
    est = 0.709 * m * m * (1 << maxrho) / r.harmonic_scaled
    n_true = 4000
    assert abs(est - n_true) / n_true < 0.13, est


def test_cms_overestimates_only_and_exact_when_wide(spark):
    """CMS invariants: min-of-counters >= exact count always; with a
    width far above the distinct-token count there are no collisions and
    the sketch is exact. A narrow width (7 counters for 60 tokens) forces
    collisions and must still never under-count."""
    rows = [
        (i, " ".join(f"v{j:02d}" for j in range(60) for _ in range(j % 3 + 1)), "aa")
        for i in range(3)
    ]
    docs = _docs(spark, rows)
    wide = {r.word: (r.exact_cnt, r.cms_est) for r in
            cms_heavy_hitters(docs, depth=4, width=4096, top=10).collect()}
    assert len(wide) == 10
    assert all(est == exact for exact, est in wide.values())
    narrow = cms_heavy_hitters(docs, depth=4, width=7, top=10).collect()
    assert all(r.cms_est >= r.exact_cnt for r in narrow)
    assert {r.word: r.exact_cnt for r in narrow} == {w: e for w, (e, _) in wide.items()}


def test_cms_registers_match_python_model(spark):
    """The narrow-width estimates equal an independently built python
    count-min sketch cell-for-cell (same deterministic hash family)."""
    from dr_source_spark.training.dedup import _MINHASH_P, minhash_family

    depth, width = 4, 11
    corpus = [(0, "a b b c c c d d d d", "aa"), (1, "a a e f c", "bb")]
    got = {r.word: r.cms_est for r in
           cms_heavy_hitters(_docs(spark, corpus), depth=depth, width=width, top=6).collect()}

    counts = {}
    for _, text, _ in corpus:
        for w in text.split():
            counts[w] = counts.get(w, 0) + 1
    fam = minhash_family(depth)
    regs = {}
    for w, c in counts.items():
        h = _base(w)
        for d, (a, b) in enumerate(fam):
            key = (d, (a * h + b) % _MINHASH_P % width)
            regs[key] = regs.get(key, 0) + c
    for w in got:
        h = _base(w)
        exp = min(regs[(d, (a * h + b) % _MINHASH_P % width)] for d, (a, b) in enumerate(fam))
        assert got[w] == exp, w


def test_cms_plan_has_no_cartesian(spark):
    """The probe join back to the registers must be a broadcast equi-join
    on (row, pos) — never BNLJ/Cartesian."""
    rows = [(i, f"a b c w{i}", "aa") for i in range(20)]
    plan = cms_heavy_hitters(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Merge laws — the property that makes a sketch a sketch: combining two
# corpora's summaries equals summarizing the combined corpus, exactly.


def _rows(prefix, n, lang="aa", start=0):
    return [(start + i, " ".join(f"{prefix}{i}_{j}" for j in range(20)) + " shared common", lang)
            for i in range(n)]


def test_kmv_merge_law(spark):
    """kmv_merge(sketch(A), sketch(B)) == sketch(A ∪ B) cell-for-cell,
    including overlapping tokens across the halves, and the merged
    estimate equals the combined-corpus estimate."""
    from dr_source_spark.training.sketch import kmv_estimate, kmv_merge, kmv_sketch

    k = 16
    a = _docs(spark, _rows("a", 10))
    b = _docs(spark, _rows("b", 10, start=100))
    both = a.unionByName(b)
    merged = kmv_merge(kmv_sketch(a, k), kmv_sketch(b, k), k)
    direct = kmv_sketch(both, k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    assert (sorted(map(tuple, kmv_estimate(merged, k).collect()))
            == sorted(map(tuple, kmv_estimate(direct, k).collect())))


def test_hll_merge_law(spark):
    """hll_merge(regs(A), regs(B)) == regs(A ∪ B) — registers combine by
    max — and the summaries agree."""
    from dr_source_spark.training.sketch import (
        hll_merge,
        hll_register_table,
        hll_summary,
    )

    a = _docs(spark, _rows("a", 8))
    b = _docs(spark, _rows("b", 8, start=100))
    both = a.unionByName(b)
    merged = hll_merge(hll_register_table(a, p=5), hll_register_table(b, p=5))
    direct = hll_register_table(both, p=5)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    assert (sorted(map(tuple, hll_summary(merged, 5).collect()))
            == sorted(map(tuple, hll_summary(direct, 5).collect())))


def test_cms_merge_law(spark):
    """cms_merge(regs(A), regs(B)) == regs(A ++ B) — counters add, and
    multiplicity across the halves is preserved (the shared tokens appear
    in both halves and must count twice)."""
    from dr_source_spark.training.sketch import cms_merge, cms_registers

    a = _docs(spark, _rows("a", 6))
    b = _docs(spark, _rows("b", 6, start=100))
    both = a.unionByName(b)
    merged = cms_merge(cms_registers(a, 4, 64), cms_registers(b, 4, 64))
    direct = cms_registers(both, 4, 64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_sketches_on_empty_and_null_inputs(spark):
    """Empty corpora yield empty outputs in all three sketches; a NULL
    group key forms its own group (SQL GROUP BY semantics, identical in
    DuckDB) and NULL text contributes nothing."""
    from dr_source_spark.training.sketch import hll_registers

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert kmv_distinct(empty).count() == 0
    assert hll_registers(empty).count() == 0
    assert cms_heavy_hitters(empty).count() == 0
    nd = _docs(spark, [(1, "a b c", None), (2, None, "aa"), (3, "x y", "aa")])
    got = {(r.grp or "<null>"): r.n_kept for r in kmv_distinct(nd, k=4).collect()}
    assert got == {"<null>": 3, "aa": 2}
