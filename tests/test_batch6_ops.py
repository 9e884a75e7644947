"""Calibration curve, TV distance, Heaps-law curve, embedding class
separation, and RFM segmentation on hand-computed fixtures."""

import datetime as dt

from pyspark.sql import functions as F


# --------------------------------------------------------- calibration_curve

def test_calibration_buckets_and_rates(spark):
    from dr_source_spark.training.evalmetrics import calibration_curve

    # scores 1..10, positives at 7..10; thresholds are 2..10, so
    # bucket(s) = 1 + #{th < s}: {1,2}->1, 3->2, ..., 10->9
    df = spark.createDataFrame(
        [(s, 1 if s >= 7 else 0) for s in range(1, 11)], "s long, y long"
    )
    out = {
        r.bucket: (r.score_lo, r.score_hi, r.n_rows, r.n_pos, r.pos_rate_bp)
        for r in calibration_curve(df, F.col("s"), F.col("y")).collect()
    }
    assert len(out) == 9
    assert out[1] == (1, 2, 2, 0, 0)
    assert out[5] == (6, 6, 1, 0, 0)
    assert out[6] == (7, 7, 1, 1, 10000)
    assert out[9] == (10, 10, 1, 1, 10000)


# --------------------------------------------------------- tv_distance_pairs

def test_tv_distance_identical_disjoint_half(spark):
    from dr_source_spark.operators.stats import tv_distance_pairs

    rows = [("A", c) for c in "aabb"] + [("B", c) for c in "aabb"]
    rows += [("C", "c")] * 4 + [("D", "a")] * 4
    df = spark.createDataFrame(rows, "grp string, cat string")
    out = {
        (r.grp_a, r.grp_b): (r.n_rows_a, r.n_rows_b, r.tv_bp)
        for r in tv_distance_pairs(df, "grp", "cat").collect()
    }
    assert len(out) == 6
    assert out[("A", "B")] == (4, 4, 0)        # identical distributions
    assert out[("A", "C")] == (4, 4, 10000)    # disjoint support
    assert out[("A", "D")] == (4, 4, 5000)     # (1/2,1/2,0) vs (1,0,0)
    assert out[("C", "D")] == (4, 4, 10000)


# ----------------------------------------------------------- heaps_law_curve

def test_heaps_vocab_growth(spark):
    from dr_source_spark.training.text import heaps_law_curve

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "c"), (4, "a b"), (5, "d e")],
        "doc_id long, text string",
    )
    out = {
        r.cut: (r.n_docs, r.last_doc_id, r.vocab_size)
        for r in heaps_law_curve(docs, n_cuts=5).collect()
    }
    assert out == {
        1: (1, 1, 2),
        2: (2, 2, 2),
        3: (3, 3, 3),
        4: (4, 4, 3),
        5: (5, 5, 5),
    }


def test_heaps_small_corpus_drops_empty_prefix_cuts(spark):
    from dr_source_spark.training.text import heaps_law_curve

    # N=2 docs, 10 cuts: cuts 1-4 map to rank (k*2) div 10 = 0 -> no
    # row (no docs yet); cuts 5-9 all map to rank 1 (legitimate
    # duplicates when N < n_cuts, still keyed and deterministic)
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = {r.cut: r.vocab_size for r in heaps_law_curve(docs, n_cuts=10).collect()}
    assert out == {5: 1, 6: 1, 7: 1, 8: 1, 9: 1, 10: 2}


# ---------------------------------------------------------- class_separation

def test_class_separation_quantized_centroids(spark):
    from dr_source_spark.training.similarity import class_separation

    rows = [
        (0, [0.0, 0.0], "X"), (1, [0.0, 0.0], "X"),
        (2, [1.0, 1.0], "Y"), (3, [1.0, 0.0], "Y"),
        (4, [-0.5, -0.5], "Z"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.dist2_q)
        for r in class_separation(emb).collect()
    }
    # centroids (quantized 1e4): X=(0,0); Y=(10000,5000); Z=(-5000,-5000)
    assert out[("X", "Y")] == (2, 2, 10000**2 + 5000**2)
    assert out[("X", "Z")] == (2, 1, 2 * 5000**2)
    assert out[("Y", "Z")] == (2, 1, 15000**2 + 10000**2)


# --------------------------------------------------------------- rfm_segments

def test_rfm_scores_and_totals(spark):
    from dr_source_spark.operators.mining import rfm_segments

    d = dt.date
    # 5 customers, strictly ordered on every dimension: cust k has last
    # order on day k (k more recent = higher r), k orders, k*100 dollars
    # total -> every score column is the identity permutation
    rows = []
    for k in range(1, 6):
        for j in range(k):
            rows.append((k, d(2020, 1, k), 100.0 * k / k))  # k orders of $100
    orders = spark.createDataFrame(rows, "o_custkey long, o_orderdate date, o_totalprice double")
    out = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, r.total_monetary_cents)
        for r in rfm_segments(orders).collect()
    }
    # cust k: recency_days = 5-k (desc rank: k=1 first) -> r_score = k;
    # frequency k -> f_score k; monetary k*10000 cents -> m_score k
    assert out == {(k, k, k): (1, k * 10000) for k in range(1, 6)}


def test_rfm_tie_breaks_by_customer_key(spark):
    from dr_source_spark.operators.mining import rfm_segments

    # two customers with IDENTICAL metrics: ranks split deterministically
    # by key -> one lands in bin 1, the other in bin 5 (n=2, b=5:
    # scores 1 + 0*5 div 2 = 1 and 1 + 1*5 div 2 = 3)
    d = dt.date
    orders = spark.createDataFrame(
        [(1, d(2020, 1, 1), 50.0), (2, d(2020, 1, 1), 50.0)],
        "o_custkey long, o_orderdate date, o_totalprice double",
    )
    out = sorted(
        (r.r_score, r.f_score, r.m_score) for r in rfm_segments(orders).collect()
    )
    assert out == [(1, 1, 1), (3, 3, 3)]
