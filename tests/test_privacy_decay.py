"""Gates for the privacy-audit reports (training/privacy.py), the
bit-shift decayed aggregate (operators/decay.py), and PMI collocation
mining (training/search.py::collocations): hand-computed semantics on
tiny inputs, the shift-clamp law (Java's >> wraps at 64 — the clamp is
what keeps 63+-event groups correct), and the plan shapes."""

from pyspark.sql import functions as F

from dr_source_spark.operators.decay import decayed_sum
from dr_source_spark.training.privacy import k_anonymity_report, l_diversity_report
from dr_source_spark.training.search import collocations


def test_k_anonymity_verdicts(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 4 + [("b", 1)], "seg string, nat long"
    )
    got = {(r.seg, r.nat): (r.group_n, r.exposed) for r in k_anonymity_report(df, ["seg", "nat"], k=5).collect()}
    assert got == {("a", 1): (5, False), ("a", 2): (4, True), ("b", 1): (1, True)}


def test_l_diversity_flags_homogeneous_groups(spark):
    # a LARGE group whose sensitive attribute is constant is still exposed
    rows = [("a", "x")] * 10 + [("b", "x"), ("b", "y"), ("b", "z")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r.q: (r.group_n, r.n_sensitive, r.exposed) for r in l_diversity_report(df, ["q"], "s", l=3).collect()}
    assert got == {"a": (10, 1, True), "b": (3, 3, False)}


def test_decayed_sum_bit_shift_arithmetic(spark):
    # events (old -> new) cents [100, 100, 100]: 100>>2 + 100>>1 + 100
    # = 25 + 50 + 100 = 175; per-row floors, not float pow
    df = spark.createDataFrame(
        [(1, i, 100) for i in range(3)], "g long, ord long, vc long"
    )
    row = decayed_sum(df, "g", [F.col("ord").asc()], F.col("vc")).collect()[0]
    assert (row.n_events, row.total_c, row.decayed_c) == (3, 300, 175)


def test_decayed_sum_clamps_shift_past_62(spark):
    # 70 events of 4 cents: contributions 4, 2, 1 then zeros. Without
    # the clamp, Java's shift-wrap at 64 would resurrect full-value
    # contributions for events 64 steps back.
    df = spark.createDataFrame(
        [(1, i, 4) for i in range(70)], "g long, ord long, vc long"
    )
    row = decayed_sum(df, "g", [F.col("ord").asc()], F.col("vc")).collect()[0]
    assert (row.n_events, row.decayed_c) == (70, 7)


def test_decayed_sum_single_exchange(spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i % 5, i, 100 + i) for i in range(50)], "g long, ord long, vc long"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        decayed_sum(df, "g", [F.col("ord").asc()], F.col("vc"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_collocations_pmi_proxy_exact(spark):
    # corpus: "a b a b" and "a b c" -> N=7 tokens; c(a)=3 c(b)=3 c(c)=1;
    # bigram (a,b) occurs 3 times -> score = 7*3*10000 div 9 = 23333
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = {(r.t1, r.t2): (r.n_pair, r.score_bp) for r in collocations(docs, min_count=3).collect()}
    assert got == {("a", "b"): (3, 23333)}


def test_collocations_min_count_prunes(spark):
    docs = spark.createDataFrame([(1, "x y x y z q")], "doc_id long, text string")
    assert collocations(docs, min_count=3).count() == 0
    got = {(r.t1, r.t2) for r in collocations(docs, min_count=2).collect()}
    assert got == {("x", "y")}


def test_collocations_only_nested_loop_is_the_one_row_total(spark, tmp_path):
    """The bigram and unigram joins are hash equi-joins; the single
    BNLJ is the 1-row corpus-total broadcast."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "a b c a b") for i in range(20)], "doc_id long, text string"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = collocations(docs, 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
    assert len(bnlj) <= 1, plan


def test_gap_fill_inserts_zero_hours(spark):
    from dr_source_spark.operators.relational import gap_fill_hourly

    rows = [
        (1, "2024-01-01 10:05:00", 1, "view", 1.0, ""),
        (2, "2024-01-01 10:50:00", 1, "view", 1.0, ""),
        (3, "2024-01-01 13:10:00", 1, "click", 1.0, ""),  # 11:00 and 12:00 missing
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r.event_type, str(r.hour)): r.n_events for r in gap_fill_hourly(ev).collect()}
    # 4 hours x 2 types = 8 rows, zeros explicit — including the types'
    # mutually-inactive hours
    assert len(got) == 8
    assert got[("view", "2024-01-01 10:00:00")] == 2
    assert got[("view", "2024-01-01 11:00:00")] == 0
    assert got[("view", "2024-01-01 12:00:00")] == 0
    assert got[("click", "2024-01-01 13:00:00")] == 1
    assert got[("click", "2024-01-01 10:00:00")] == 0
    assert got[("view", "2024-01-01 13:00:00")] == 0


def test_fuzzy_matches_block_and_verify(spark):
    from dr_source_spark.training.fuzzy import fuzzy_string_matches

    df = spark.createDataFrame(
        [(w,) for w in ["kitten", "sitten", "sittin", "mitten", "kettle", "kitten"]],
        "name string",
    )
    got = {(r.name_a, r.name_b): r.dist for r in fuzzy_string_matches(df, "name", max_dist=2).collect()}
    assert got == {
        ("kitten", "sitten"): 1,
        ("kitten", "mitten"): 1,
        ("sitten", "sittin"): 1,
        ("kitten", "sittin"): 2,
        ("mitten", "sitten"): 1,
        ("mitten", "sittin"): 2,
    }  # kettle is distance 3 from everything: verified out


def test_fuzzy_short_strings_block_only_on_identity(spark):
    """Documented contract: strings shorter than the q-gram width
    contribute themselves as their only gram, so 'ab'/'ba' (distance 2)
    do NOT pair — the blocking predicate is part of the definition."""
    from dr_source_spark.training.fuzzy import fuzzy_string_matches

    df = spark.createDataFrame([("ab",), ("ba",)], "name string")
    assert fuzzy_string_matches(df, "name", max_dist=2).count() == 0


def test_fuzzy_plans_equi_join_not_all_pairs(spark, tmp_path):
    from dr_source_spark.training.fuzzy import fuzzy_string_matches

    p = str(tmp_path / "n.parquet")
    spark.createDataFrame(
        [(f"name_{i:04d}",) for i in range(500)], "name string"
    ).write.parquet(p)
    plan = (
        fuzzy_string_matches(spark.read.parquet(p), "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_degree_mixing_stats_match_pure_python(spark):
    """Sufficient-statistics law: the emitted integers reproduce the
    textbook assortativity of a star-plus-triangle graph computed in
    pure Python (a star is maximally disassortative: r < 0)."""
    from dr_source_spark.operators.graph import degree_mixing_stats

    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_mixing_stats(df).collect()[0]
    sym = edges + [(b, a) for a, b in edges]
    from collections import Counter

    deg = Counter()
    for a, b in sym:
        deg[a] += 1
    m = len(sym)
    sx = sum(deg[a] for a, b in sym)
    sxx = sum(deg[a] ** 2 for a, b in sym)
    sxy = sum(deg[a] * deg[b] for a, b in sym)
    assert (row.m, row.sx, row.sxx, row.sxy) == (m, sx, sxx, sxy)
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert r < 0  # the star dominates: hubs meet leaves


def test_fingerprint_detects_single_row_divergence(spark):
    """Anti-entropy law: identical tables fingerprint identically; one
    mutated row flips exactly its bucket's checksum while every other
    bucket stays equal."""
    from pyspark.sql import functions as FF

    def fp(df):
        canon = FF.concat_ws("|", FF.col("k").cast("string"), FF.col("v"))
        h = FF.conv(FF.substring(FF.md5(canon), 1, 8), 16, 10).cast("long")
        return {
            r.bucket: (r.n, r.s)
            for r in df.select((FF.col("k") % 8).alias("bucket"), h.alias("_h"))
            .groupBy("bucket")
            .agg(FF.count("*").alias("n"), FF.sum("_h").alias("s"))
            .collect()
        }

    base = spark.createDataFrame([(i, f"v{i}") for i in range(64)], "k long, v string")
    mutated = spark.createDataFrame(
        [(i, "CHANGED" if i == 13 else f"v{i}") for i in range(64)], "k long, v string"
    )
    a, b = fp(base), fp(mutated)
    diff = {bk for bk in a if a[bk] != b[bk]}
    assert diff == {13 % 8}
