"""t-closeness, Kendall tau-a, JSON field profiling, and funnel
latency on hand-computed fixtures."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------- t_closeness_report

def test_t_closeness_hand_computed(spark):
    from dr_source_spark.training.privacy import t_closeness_report

    # global bins: 0 x4, 1 x4 -> Q = (1/2, 1/2). group A = (1,0): cum
    # diffs |1-1/2| + 0 -> t = 1/2 (m-1 = 1) -> 5000 bp. group B
    # mirrors Q exactly -> 0.
    rows = [("A", 0)] * 2 + [("B", 0)] * 2 + [("B", 1)] * 2 + [("C", 1)] * 2
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r.grp: (r.group_n, r.t_bp, r.exposed)
        for r in t_closeness_report(df, ["grp"], F.col("v")).collect()
    }
    assert out["A"] == (2, 5000, True)
    assert out["B"] == (4, 0, False)
    assert out["C"] == (2, 5000, True)


def test_t_closeness_single_bin_undefined(spark):
    from dr_source_spark.training.privacy import t_closeness_report

    df = spark.createDataFrame([("A", 7), ("B", 7)], "grp string, v long")
    out = {r.grp: (r.t_bp, r.exposed) for r in t_closeness_report(df, ["grp"], F.col("v")).collect()}
    assert out == {"A": (None, False), "B": (None, False)}


# ---------------------------------------------------------- kendall_tau_grid

def test_kendall_perfect_inverse_and_ties(spark):
    from dr_source_spark.operators.stats import kendall_tau_grid

    # perfectly monotone: every pair concordant -> tau_a = 10000
    up = spark.createDataFrame([(i, i) for i in range(1, 5)], "x long, y long")
    r = kendall_tau_grid(up, F.col("x"), F.col("y")).collect()[0]
    assert (r.n_rows, r.concordant, r.discordant, r.tau_a_bp) == (4, 6, 0, 10000)

    down = spark.createDataFrame([(i, -i) for i in range(1, 5)], "x long, y long")
    r = kendall_tau_grid(down, F.col("x"), F.col("y")).collect()[0]
    assert (r.concordant, r.discordant, r.tau_a_bp) == (0, 6, -10000)

    # x ties: (1,1),(1,2),(2,3): pairs with x1<x2: (1,1)-(2,3) C,
    # (1,2)-(2,3) C; the x-tied pair counts neither -> tau = 2/3
    tied = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], "x long, y long")
    r = kendall_tau_grid(tied, F.col("x"), F.col("y")).collect()[0]
    assert (r.n_rows, r.n_cells, r.concordant, r.discordant, r.tau_a_bp) == (3, 3, 2, 0, 6666)


# --------------------------------------------------------- json_field_profile

def test_json_field_profile_fill_and_stats(spark):
    from dr_source_spark.operators.stats import json_field_profile

    # NON-INTEGRAL numerics must count as unfilled on BOTH engines:
    # try_cast is not engine-stable (Spark nulls '12.5', DuckDB rounds
    # it to 13), so the operator guards with an integral regex instead
    rows = [
        ("a", '{"k": 5}'), ("a", '{"k": 7}'), ("a", '{"other": 1}'),
        ("b", '{"k": "not_a_number"}'), ("b", None), ("b", '{"k": 12.5}'),
    ]
    df = spark.createDataFrame(rows, "grp string, props string")
    out = {
        r.grp: (r.n_rows, r.n_filled, r.fill_bp, r.min_val, r.max_val, r.sum_val)
        for r in json_field_profile(df, "props", "$.k", "grp").collect()
    }
    assert out["a"] == (3, 2, 6666, 5, 7, 12)
    assert out["b"] == (3, 0, 0, None, None, None)


# -------------------------------------------------------------- funnel_latency

def test_funnel_latency_order_statistics(spark):
    from dr_source_spark.operators.relational import funnel_latency

    base = dt.datetime(2024, 1, 1)

    def ev(u, s, t):
        return (u, base + dt.timedelta(seconds=s), t)

    rows = []
    # three full converters with latencies 10, 20, 100 s
    for u, l in ((1, 10), (2, 20), (3, 100)):
        rows += [ev(u, 0, "view"), ev(u, l // 2, "click"), ev(u, l, "purchase")]
    # a non-converter (view only) must not contribute
    rows.append(ev(9, 0, "view"))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = funnel_latency(df).collect()[0]
    # n=3: p50 idx (2*50) div 100 + 1 = 2 -> 20; p90 idx (2*90) div 100
    # + 1 = 2 -> 20; mean = 130 div 3 = 43
    assert (r.n_converted, r.min_sec, r.p50_sec, r.p90_sec, r.max_sec, r.mean_sec) == (
        3, 10, 20, 20, 100, 43,
    )


# ---------------------------------------------------------------- ppjoin_pairs

def test_ppjoin_exact_pairs_and_thresholds(spark):
    from dr_source_spark.training.dedup import ppjoin_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),      # J(1,2) = 3/5 = 0.6
            (3, "a b x y"),      # J(1,3) = 2/6 = 0.33
            (4, "z w"),          # disjoint
            (5, "a b c d"),      # identical to 1
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_bp)
        for r in ppjoin_pairs(docs, tau_bp=6000).collect()
    }
    assert out == {
        (1, 2): (3, 6000),
        (1, 5): (4, 10000),
        (2, 5): (3, 6000),
    }


def test_ppjoin_completeness_vs_brute_force(spark):
    """The prefix filter must lose NOTHING: compare against an
    in-Python all-pairs sweep on an overlapping-vocab corpus."""
    from dr_source_spark.training.dedup import ppjoin_pairs

    vocab = ["w%d" % i for i in range(12)]
    texts = {}
    for d in range(1, 11):
        # deterministic overlapping subsets of varying size
        toks = [vocab[(d * 3 + j * 5) % 12] for j in range(3 + d % 4)]
        texts[d] = " ".join(toks)
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def jac(a, b):
        sa, sb = set(texts[a].split()), set(texts[b].split())
        return len(sa & sb) * 10000 // len(sa | sb)

    expected = {
        (a, b): jac(a, b)
        for a in texts for b in texts
        if a < b and jac(a, b) >= 5000
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard_bp
        for r in ppjoin_pairs(docs, tau_bp=5000).collect()
    }
    assert got == expected


# ---------------------------------------------------------- trimmed_mean

def test_trimmed_mean_hand_computed(spark):
    from dr_source_spark.operators.stats import trimmed_mean_by_group

    rows = [("g", i, i) for i in range(1, 11)]          # 1..10, k=1 -> mean(2..9)=5
    rows += [("tiny", 1, 1), ("tiny", 2, 2)]            # trim 10% of 2 -> k=0 -> mean 1
    rows += [("neg", 1, -10), ("neg", 2, -3), ("neg", 3, -2)]
    df = spark.createDataFrame(rows, "grp string, rid long, v long")
    out = {
        r.grp: (r.n, r.n_trimmed_each_side, r.n_kept, r.trimmed_mean)
        for r in trimmed_mean_by_group(df, "grp", F.col("v"), "rid").collect()
    }
    assert out["g"] == (10, 1, 8, 5)          # 44/8 = 5.5 -> trunc 5
    assert out["tiny"] == (2, 0, 2, 1)        # 3/2 -> 1
    # neg with 34% trim: k=1, keep only -3
    out2 = {
        r.grp: r.trimmed_mean
        for r in trimmed_mean_by_group(df, "grp", F.col("v"), "rid", trim_bp=3400).collect()
    }
    assert out2["neg"] == -3


def test_trimmed_mean_all_trimmed_is_null(spark):
    from dr_source_spark.operators.stats import trimmed_mean_by_group

    df = spark.createDataFrame([("g", 1, 5), ("g", 2, 6)], "grp string, rid long, v long")
    r = trimmed_mean_by_group(df, "grp", F.col("v"), "rid", trim_bp=5000).collect()[0]
    assert (r.n_kept, r.trimmed_mean) == (0, None)


# -------------------------------------------------------------- wape_backtest

def test_wape_naive_lag_backtest(spark):
    from dr_source_spark.operators.stats import wape_backtest

    rows = [("g", p, a) for p, a in ((1, 10), (2, 20), (3, 30))]
    rows += [("lonely", 7, 5)]  # no lag-predecessor -> absent
    df = spark.createDataFrame(rows, "grp string, per long, amt long")
    out = {
        r.grp: (r.n_periods_scored, r.actual_total, r.abs_err_total, r.wape_bp)
        for r in wape_backtest(df, "grp", F.col("per"), F.col("amt"), lag=1).collect()
    }
    assert out == {"g": (2, 50, 20, 4000)}


def test_wape_gap_periods_not_scored(spark):
    from dr_source_spark.operators.stats import wape_backtest

    # periods 1 and 3 with lag 1: period 3's predecessor (2) is absent
    # -> nothing scored -> group absent (a gap is not a zero forecast)
    df = spark.createDataFrame([("g", 1, 10), ("g", 3, 30)], "grp string, per long, amt long")
    assert wape_backtest(df, "grp", F.col("per"), F.col("amt"), lag=1).count() == 0


# --------------------------------------------------------- er_blocking_quality

def test_er_blocking_quality_completeness_and_reduction(spark):
    from dr_source_spark.operators.entity_link import er_blocking_quality
    from pyspark.sql import functions as F

    # entities of 2 mentions each; e1/e2 duplicated verbatim (blocking
    # MUST pair them), e3's variants share no trigram (blocking CANNOT)
    rows = [
        (10, "alpha beta gamma"), (11, "alpha beta gamma"),
        (20, "delta epsilon zeta"), (21, "delta epsilon zeta"),
        (30, "omega psi chi"), (31, "qqq www vvv"),
    ]
    m = spark.createDataFrame(rows, "mention_id long, name string")
    r = er_blocking_quality(
        m, F.col("mention_id") / 10, df_cap_pct=100
    ).collect()[0]
    assert r.n_mentions == 6 and r.n_truth_pairs == 3
    assert r.n_matched == 2                       # e3's pair is unblockable
    assert r.pair_completeness_bp == 6666
    assert r.n_candidate_pairs >= 2
    # internal consistency of the derived ratios
    assert r.candidate_precision_bp == 2 * 10000 // r.n_candidate_pairs
    assert r.reduction_ratio_bp == 10000 - r.n_candidate_pairs * 10000 // 15


# -------------------------------------------------------- transitivity_global

def test_transitivity_triangle_plus_tail_and_star(spark):
    from dr_source_spark.operators.graph import transitivity_global

    # triangle 1-2-3 with a tail 3-4: degrees 2,2,3,1 -> wedges
    # 1+1+3+0 = 5; one triangle -> C = 3/5 -> 6000 bp
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    r = transitivity_global(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges, r.transitivity_bp) == (
        4, 4, 1, 5, 6000,
    )
    # pure star: wedges but no triangles -> 0
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    assert transitivity_global(star).collect()[0].transitivity_bp == 0
    # single edge: no wedges -> NULL
    one = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert transitivity_global(one).collect()[0].transitivity_bp is None


# ------------------------------------------------------- readability_profile

def test_readability_hand_computed(spark):
    from dr_source_spark.training.text import readability_profile

    # "go. go now." : words=3, sentences=2, vowel-groups: o,o,o -> 3
    # fk = 39*3 div 2 + 1180*3 div 3 - 1559 = 58 + 1180 - 1559 = -321
    # "aa bb cc dd" : w=4 s=1(floor) y=1 -> 156 + 295 - 1559 = -1108
    docs = spark.createDataFrame(
        [(1, "go. go now.", "en"), (2, "aa bb cc dd", "fr"), (3, "", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {
        r.grp: (r.n_docs, r.mean_fk_x100, r.min_fk_x100, r.max_fk_x100)
        for r in readability_profile(docs).collect()
    }
    assert out["en"] == (1, -321, -321, -321)
    # zero-word doc 3 excluded -> fr has one doc
    assert out["fr"] == (1, -1108, -1108, -1108)


def test_readability_mean_truncates_with_sign(spark):
    from dr_source_spark.training.text import readability_profile

    # two docs with fk -321 and -1108: sum -1429, mean -714 (trunc
    # toward zero, NOT floor -715)
    docs = spark.createDataFrame(
        [(1, "go. go now.", "x"), (2, "aa bb cc dd", "x")],
        "doc_id long, text string, lang string",
    )
    r = readability_profile(docs).collect()[0]
    assert (r.n_docs, r.mean_fk_x100) == (2, -714)


# ---------------------------------------------------------- runs_test

def test_runs_test_oscillating_and_trending(spark):
    import datetime as dt
    from dr_source_spark.operators.stats import runs_test_by_group

    base = dt.datetime(2024, 1, 1)
    rows = []
    # oscillating: 1,5,1,5,1,5 -> median (lower) = 1, hi pattern
    # 0,1,0,1,0,1 -> 6 runs; n1=3 n0=3 -> E[R]x100 = (600+1800)/6 = 400
    for i, v in enumerate([1, 5, 1, 5, 1, 5]):
        rows.append(("osc", v, base + dt.timedelta(seconds=i), i))
    # trending: 1,2,3,4,5,6 -> median 3; hi = 0,0,0,1,1,1 -> 2 runs
    for i, v in enumerate([1, 2, 3, 4, 5, 6]):
        rows.append(("trend", v, base + dt.timedelta(seconds=i), i))
    df = spark.createDataFrame(rows, "grp string, v long, ts timestamp, rid long")
    out = {
        r.grp: (r.n, r.n_above, r.n_below, r.n_runs, r.expected_runs_x100)
        for r in runs_test_by_group(df, "grp", F.col("v"), "ts", "rid").collect()
    }
    assert out["osc"] == (6, 3, 3, 6, 400)
    assert out["trend"] == (6, 3, 3, 2, 400)


# ------------------------------------------------------- silhouette_lite

def test_silhouette_separated_and_misfit(spark):
    from dr_source_spark.training.similarity import silhouette_lite

    rows = [
        (0, [0.0, 0.0], "A"), (1, [0.1, 0.0], "A"),
        (2, [1.0, 1.0], "B"), (3, [0.9, 1.0], "B"),
        # C straddles B: vec 4 sits on B itself (misfit), vec 5 is far
        # out so C's centroid lands between them at (2, 2)
        (4, [1.0, 1.0], "C"), (5, [3.0, 3.0], "C"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = {
        r.label: (r.n_vectors, r.n_negative)
        for r in silhouette_lite(emb).collect()
    }
    # A and B are tight, far from others -> no misfits, positive mean
    assert out["A"] == (2, 0)
    assert out["B"] == (2, 0)
    # C's centroid is (2,2); vec 4 is much closer to B's centroid -> negative
    assert out["C"][1] == 1
    sils = {r.label: r.mean_sil_bp for r in silhouette_lite(emb).collect()}
    assert sils["A"] > 0 and sils["B"] > 0 and sils["C"] < 0


def test_silhouette_identical_centroids_score_zero(spark):
    from dr_source_spark.training.similarity import silhouette_lite

    # both labels collapse to the same centroid: a == b for every
    # vector -> s = 0 everywhere
    rows = [(0, [0.5, 0.5], "A"), (1, [0.5, 0.5], "B")]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = {r.label: r.mean_sil_bp for r in silhouette_lite(emb).collect()}
    assert out == {"A": 0, "B": 0}
