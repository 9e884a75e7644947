"""Gates for the inverted-index search family (training/search.py) and
the 2-D Pareto frontier (operators/skyline.py): semantics on known tiny
inputs, the brute-force dominance cross-check for the skyline, and
physical-plan assertions for the scale properties each operator exists
to provide (row-wise postings, equi-join-only phrase matching, the
window over distinct x only)."""

import pytest
from pyspark.sql import functions as F

from dr_source_spark.operators.skyline import pareto_frontier_2d
from dr_source_spark.training.search import (
    build_postings,
    conjunctive_search,
    phrase_search,
    token_positions,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_positions_one_based_and_null_safe(spark):
    docs = _docs(spark, [(1, "Alpha beta  alpha"), (2, None), (3, ""), (4, "   ")])
    got = {(r.doc_id, r.pos, r.token) for r in token_positions(docs).collect()}
    assert got == {(1, 1, "alpha"), (1, 2, "beta"), (1, 3, "alpha")}


def test_postings_are_row_wise_with_tf_and_first_pos(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b b b")])
    got = {(r.token, r.doc_id): (r.tf, r.first_pos) for r in build_postings(docs).collect()}
    assert got == {("a", 1): (2, 1), ("b", 1): (1, 2), ("b", 2): (3, 1)}


def test_conjunctive_requires_all_terms(spark):
    docs = _docs(spark, [(1, "x y z"), (2, "x y"), (3, "x x y z z")])
    got = {r.doc_id: r.score_tf for r in conjunctive_search(docs, ["x", "z"]).collect()}
    # doc 2 lacks 'z'; scores sum tf over the query terms only
    assert got == {1: 2, 3: 4}


def test_phrase_needs_adjacency_and_counts_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "merge slow join"),      # one match at pos 1
            (2, "merge fast slow"),      # terms present but not adjacent
            (3, "a a a"),                # overlapping matches for "a a"
            (4, "slow merge"),           # reversed order
        ],
    )
    got = {r.doc_id: (r.n_matches, r.first_pos) for r in phrase_search(docs, ["merge", "slow"]).collect()}
    assert got == {1: (1, 1)}
    overlaps = {r.doc_id: r.n_matches for r in phrase_search(docs, ["a", "a"]).collect()}
    assert overlaps == {3: 2}


def test_phrase_single_term_is_presence_with_count(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b")])
    got = {r.doc_id: (r.n_matches, r.first_pos) for r in phrase_search(docs, ["a"]).collect()}
    assert got == {1: (2, 1)}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_phrase_plans_equi_joins_only(spark):
    """The positional joins must be HASH equi-joins on (doc_id, pos-i) —
    a nested loop here is the quadratic phrase-search scale killer."""
    docs = _docs(spark, [(1, "merge slow")])
    plan = _plan(phrase_search(docs, ["merge", "slow", "join"]))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_conjunctive_term_filter_reaches_the_stream(spark, tmp_path):
    """The literal IN filter must push below the postings aggregate so
    only matching tokens ever shuffle — visible as a pushed string
    filter on the parquet scan of the text-derived stream."""
    p = str(tmp_path / "docs.parquet")
    _docs(spark, [(1, "x y"), (2, "y z")]).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(conjunctive_search(docs, ["x", "z"]))
    # the isin filter sits under the first aggregate (plans print
    # top-down, so a larger index = deeper in the tree) and directly
    # above the token generator — only matching tokens ever aggregate
    first_agg = plan.index("HashAggregate")
    fidx = plan.index("IN (x,z)")
    assert fidx > first_agg, plan
    assert "Generate posexplode" in plan[fidx:], plan


def test_pareto_matches_brute_force(spark):
    """Exactness gate: the shuffle-light frontier equals the textbook
    NOT EXISTS dominance screen on a deterministic pseudo-random set
    (strict-Pareto: <=/>= with at least one strict)."""
    rows = [(i, (i * 7919) % 97, (i * 104729) % 89) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
    pts = {i: (x, y) for i, x, y in rows}
    expect = {
        i
        for i, (x, y) in pts.items()
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for j, (x2, y2) in pts.items()
            if j != i
        )
    }
    assert got == expect and got


def test_pareto_keeps_duplicate_frontier_points(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 5), (3, 20, 4)], "id long, x long, y long"
    )
    got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
    # identical points don't strictly dominate each other; (20,4) is
    # dominated by (10,5)
    assert got == {1, 2}


def test_pareto_window_runs_over_distinct_x_only(spark, tmp_path):
    """The single-partition exchange must sit ABOVE the per-x aggregate
    (distinct x values), never over the raw table — the same bounded
    shape as the equi-depth histogram — and the join-back must
    broadcast."""
    p = str(tmp_path / "pts.parquet")
    spark.createDataFrame(
        [(i, i % 13, i % 7) for i in range(100)], "id long, x long, y long"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = _plan(pareto_frontier_2d(df, "x", "y"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    sp = plan.index("Exchange SinglePartition")
    assert "HashAggregate" in plan[sp : sp + 2000], plan


def test_ranked_search_matches_pure_python_bm25(spark):
    """Exact-rational BM25 law: the integer-div scores reproduce a pure
    Python recount of the same formula, and ranking is deterministic."""
    from dr_source_spark.training.search import ranked_search

    texts = {1: "x x y", 2: "x z z z", 3: "y y y y", 4: "w w"}
    docs = _docs(spark, list(texts.items()))
    got = [(r.doc_id, r.score, r.n_terms) for r in ranked_search(docs, ["x", "y"], k=10).collect()]

    toks = {d: t.split() for d, t in texts.items()}
    N = len(toks)
    A = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in ("x", "y")}
    exp = {}
    for d, v in toks.items():
        s, n = 0, 0
        for t in ("x", "y"):
            tf = v.count(t)
            if not tf:
                continue
            idf_bp = ((N - df[t]) * 10000) // df[t]
            s += (idf_bp * 44 * A * tf) // (20 * A * tf + 6 * A + 18 * len(v) * N)
            n += 1
        if n:
            exp[d] = (s, n)
    assert {d: (s, n) for d, s, n in got} == exp
    # deterministic ordering: score desc then doc_id asc
    assert got == sorted(got, key=lambda r: (-r[1], r[0]))


def test_presence_bitmap_words_and_merge_law(spark):
    """Bit placement is exact (doc 0 -> bit 0 of word 0; doc 33 -> bit 1
    of word 1) and the index merges by bit_or: bitmap(A) OR bitmap(B)
    == bitmap(A union B) word-for-word."""
    from pyspark.sql import functions as FF

    from dr_source_spark.training.search import presence_bitmap

    a_rows = [(0, "l"), (1, "l"), (33, "l")]
    b_rows = [(2, "l"), (33, "l"), (64, "l")]
    schema = "doc_id long, lang string"

    def bm(rows):
        df = spark.createDataFrame(rows, schema)
        return {(r.grp, r.word_idx): r.word for r in presence_bitmap(df, "lang").collect()}

    assert bm(a_rows) == {("l", 0): 0b11, ("l", 1): 1 << 1}
    merged = {}
    for m in (bm(a_rows), bm(b_rows)):
        for k, v in m.items():
            merged[k] = merged.get(k, 0) | v
    assert merged == bm(a_rows + b_rows)
