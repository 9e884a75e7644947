"""Batch-63 operators on hand-computed fixtures: behavioral-diversity
census (operators/stats.py) and templated-prefix family screen
(training/text.py)."""

from pyspark.sql import functions as F


# --------------------------------------------------------------- user_diversity

def test_user_diversity_hand_computed(spark):
    from dr_source_spark.operators.stats import user_diversity

    rows = [
        (0, 1, "view"), (1, 1, "view"), (2, 1, "click"),   # u1: 2 types
        (3, 2, "view"),                                    # u2: 1 type
        (4, 3, "purchase"),                                # u3: 1 type
        (5, 4, "view"), (6, 4, "click"), (7, 4, "purchase"),  # u4: 3 types
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = {r["n_types"]: r for r in user_diversity(df).collect()}
    assert (out[1]["n_users"], out[1]["share_bp"]) == (2, 5000)
    assert (out[2]["n_users"], out[2]["share_bp"]) == (1, 2500)
    assert (out[3]["n_users"], out[3]["share_bp"]) == (1, 2500)


# -------------------------------------------------------------- prefix_families

def test_prefix_families_hand_computed(spark):
    from dr_source_spark.training.text import prefix_families

    tmpl = "dear customer thank you for your business " * 2  # > 32 chars
    rows = [
        (0, tmpl + "order A"),
        (1, tmpl + "order B"),
        (2, "DEAR  Customer thank you for your business and more"),  # normalizes in
        (3, "a completely different opening line for this document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["family_size"]: r for r in prefix_families(df).collect()}
    # family of 3 (docs 0,1,2 share the normalized 32-char prefix) +
    # one singleton -> docs shares 7500 / 2500 bp
    assert (out[3]["n_families"], out[3]["docs_share_bp"]) == (1, 7500)
    assert (out[1]["n_families"], out[1]["docs_share_bp"]) == (1, 2500)


def test_prefix_families_short_and_null_docs_group(spark):
    from dr_source_spark.training.text import prefix_families

    # NULL and "" normalize identically -> one family of 2
    rows = [(0, None), (1, ""), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["family_size"]: r["n_families"] for r in prefix_families(df).collect()}
    assert out == {2: 1, 1: 1}
