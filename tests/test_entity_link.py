"""Gates for record-level entity resolution (operators/entity_link.py):
blocking via b-smallest non-stop trigram hashes, capped buckets, exact
integer-Jaccard verification, component merge. DuckDB value-hash oracle:
customer_er_entities in __spark_entry__ (planted corruption variants
over customer — recovered 1500/1500 clusters with zero cross-entity
merges at sf0.01)."""

import hashlib

from pyspark.sql import functions as F

from dr_source_spark.operators.entity_link import (
    er_candidate_pairs,
    er_entities,
    er_verified_pairs,
    mention_grams,
    normalize_mention,
)


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "mention_id long, name string")


def _entity_rows(n_entities=12):
    """Deterministic dirty mentions: each entity is a distinctive base
    string (md5-derived, so entities share almost no trigrams) with a
    clean variant, a one-char-deleted variant and a one-char-mangled
    variant."""
    rows = []
    for e in range(n_entities):
        base = "entity-%03d " % e + hashlib.md5(str(e).encode()).hexdigest()
        p = (e % 20) + 5
        rows.append((e * 4, base))
        rows.append((e * 4 + 1, base[:p] + base[p + 1 :]))  # deletion
        rows.append((e * 4 + 2, base[:p] + "x" + base[p + 1 :]))  # substitution
    return rows


def test_planted_variants_recovered_exactly(spark):
    """Every entity's three variants share one entity_id (= the clean
    variant's mention_id, the component min) and no two entities merge."""
    # df_cap_pct is RELATIVE to corpus size: on 36 mentions an
    # entity's own grams have df = 3/36 = 8%, so the production default
    # (5%) would screen them out of blocking — a small corpus needs a
    # proportionally looser stop-gram bar (the sf0.01 driver query keeps
    # the 5% default over 4500 mentions, where df=3 is 0.07%)
    out = er_entities(_mentions(spark, _entity_rows()), df_cap_pct=20).collect()
    got = {}
    for r in out:
        got.setdefault(r.entity_id, set()).add(r.mention_id)
    assert len(got) == 12
    for e in range(12):
        assert got[e * 4] == {e * 4, e * 4 + 1, e * 4 + 2}


def test_shared_prefix_does_not_funnel_blocking(spark):
    """The stop-gram screen: give EVERY mention a long identical prefix
    (df = 100% ≫ df_cap_pct). Without the screen the prefix's minimal
    trigram hashes dominate every mention's key set, funnelling the
    whole table toward shared buckets and — under the bucket cap —
    dropping the true pairs. With it, blocking rides the rare tail
    grams and recovery is still exact."""
    prefix = "customer#000000000 record "
    rows = [(mid, prefix + name) for mid, name in _entity_rows(10)]
    out = er_entities(_mentions(spark, rows), df_cap_pct=20, max_bucket=8).collect()
    got = {}
    for r in out:
        got.setdefault(r.entity_id, set()).add(r.mention_id)
    assert len(got) == 10
    for e in range(10):
        assert got[e * 4] == {e * 4, e * 4 + 1, e * 4 + 2}


def test_jaccard_is_exact_integer_over_full_gram_sets(spark):
    """Verified-pair arithmetic vs a direct Python model: distinct
    normalized trigram sets (stop-grams INCLUDED at scoring), integer
    100*|∩| div |∪|."""
    a, b = "alpha beta gamma", "alpha beta gamba"
    rows = [(1, a), (2, b)]
    grams = mention_grams(_mentions(spark, rows))
    pairs = spark.createDataFrame([(1, 2)], "ia long, ib long")
    got = er_verified_pairs(grams, pairs, min_pct=0).collect()[0]

    def tri(s):
        s = "".join(c for c in s.lower() if c.isalnum())
        return {s[i : i + 3] for i in range(len(s) - 2)}

    sa, sb = tri(a), tri(b)
    assert got.n_common == len(sa & sb)
    assert got.n_union == len(sa | sb)
    assert got.jaccard_pct == 100 * len(sa & sb) // len(sa | sb)


def test_bucket_cap_degrades_to_singletons_not_errors(spark):
    """max_bucket=1 makes every multi-member bucket oversized: all pairs
    drop (count-first, before any id array is built) and every mention
    keeps its own id — deterministic degradation, never an error or a
    partial merge."""
    out = er_entities(
        _mentions(spark, _entity_rows(5)), df_cap_pct=30, max_bucket=1
    ).collect()
    assert all(r.entity_id == r.mention_id for r in out)


def test_short_and_null_mentions_stay_singletons(spark):
    """Mentions that normalize to < 3 chars (or NULL) produce no grams,
    never block, and come back as singletons — the output covers every
    input mention."""
    rows = [(1, "ab"), (2, None), (3, "!!"), (4, "a proper mention string"),
            (5, "a proper mention string")] + [
        # distinct fillers: document frequency is relative to mentions
        # that PRODUCE grams, so the identical pair needs company or its
        # shared grams are 100%-df stop-grams by definition
        (10 + i, "filler %d " % i + hashlib.md5(str(100 + i).encode()).hexdigest())
        for i in range(4)
    ]
    out = {r.mention_id: r.entity_id
           for r in er_entities(_mentions(spark, rows), df_cap_pct=50).collect()}
    assert out[1] == 1 and out[2] == 2 and out[3] == 3
    assert out[4] == 4 and out[5] == 4  # identical strings do link
    assert all(out[10 + i] == 10 + i for i in range(4))
    empty = spark.createDataFrame([], "mention_id long, name string")
    assert er_entities(empty).count() == 0


def test_er_plans_have_no_cartesian_or_bnlj(spark):
    """Scale gate: candidate generation is bucket-grouped (in-plan
    combination explode, no self-join of the gram pipeline) and the
    verify stage is pair x gram equi-joins — no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere except the broadcast of the 1-row
    mention total."""
    m = _mentions(spark, _entity_rows(6))
    grams = mention_grams(m)
    pairs = er_candidate_pairs(grams)
    verified = er_verified_pairs(grams, pairs)
    for df in (pairs, verified):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
        # the only BNLJ allowed is the 1-row mention-total broadcast
        # (Cross keyword); it may appear once per evaluation of the
        # blocking subplan but never against un-aggregated data
        assert all("Cross" in ln for ln in bnlj), bnlj
        assert len(bnlj) <= 2, plan


def test_normalize_mention_is_alnum_lower(spark):
    df = spark.createDataFrame([("  Ab-C 1.2!Z ",)], "s string")
    assert df.select(normalize_mention(F.col("s")).alias("n")).collect()[0].n == "abc12z"


class TestSortedNeighborhood:
    def _m(self, spark, names):
        return spark.createDataFrame(
            [(i + 1, n) for i, n in enumerate(names)],
            "mention_id long, name string",
        )

    def test_window2_adjacent_only(self, spark):
        from dr_source_spark.operators.entity_link import snm_candidate_pairs

        m = self._m(spark, ["alpha1", "zeta", "alpha2"])
        # sort order: alpha1(1), alpha2(3), zeta(2) -> adjacency pairs
        # (1,3) and (3,2); window=2 means rank gap exactly 1
        pairs = {
            tuple(sorted((r["ia"], r["ib"])))
            for r in snm_candidate_pairs(m, window=2).collect()
        }
        assert pairs == {(1, 3), (2, 3)}

    def test_no_duplicate_pairs_across_blocks(self, spark):
        from dr_source_spark.operators.entity_link import snm_candidate_pairs

        m = self._m(spark, [f"n{i:02d}" for i in range(6)])
        out = snm_candidate_pairs(m, window=3).collect()
        # gaps 1 and 2 over 6 ranks: 5 + 4 = 9 pairs, each exactly once
        assert len(out) == 9
        assert len({(r["ia"], r["ib"]) for r in out}) == 9

    def test_quality_report_shared_core(self, spark):
        from dr_source_spark.operators.entity_link import (
            blocking_quality_report,
            snm_candidate_pairs,
        )
        from pyspark.sql import functions as F

        # two entities, two mentions each, names adjacent in sort order
        # within entity -> window 2 achieves perfect completeness
        m = spark.createDataFrame(
            [(10, "aaa1"), (11, "aaa2"), (20, "bbb1"), (21, "bbb2")],
            "mention_id long, name string",
        )
        (r,) = blocking_quality_report(
            m, F.expr("mention_id div 10"), snm_candidate_pairs(m, window=2)
        ).collect()
        assert r["n_truth_pairs"] == 2
        assert r["n_candidate_pairs"] == 3  # 3 adjacent pairs in sort order
        assert r["n_matched"] == 2
        assert r["pair_completeness_bp"] == 10000
        assert r["candidate_precision_bp"] == 10000 * 2 // 3
