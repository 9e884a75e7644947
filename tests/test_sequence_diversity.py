"""Simpson diversity (operators/stats.py) and n-gram novelty
(training/text.py) on hand-computed fixtures.

(The session's draft sequence-analytics module was dropped before
commit: funnel / Markov-transition / retention queries already exist in
operators/relational.py — see events_funnel, events_markov_transitions,
events_retention.)
"""

from pyspark.sql import functions as F


# ------------------------------------------------------------- simpson_index

def test_simpson_hand_computed_and_undefined(spark):
    from dr_source_spark.operators.stats import simpson_index

    rows = [("g1", c) for c in "aabb"] + [("g2", "a")] * 3 + [("g3", "z")]
    df = spark.createDataFrame(rows, "grp string, cat string")
    out = {
        r.grp: (r.n_rows, r.n_categories, r.simpson_bp)
        for r in simpson_index(df, "grp", "cat").collect()
    }
    # g1: (2*1 + 2*1) / (4*3) = 4/12 -> 3333; g2: 6/6 -> 10000; g3: N<2 -> NULL
    assert out == {"g1": (4, 2, 3333), "g2": (3, 1, 10000), "g3": (1, 1, None)}


# ------------------------------------------------------------- ngram_novelty

def test_ngram_novelty_first_doc_wins(spark):
    from dr_source_spark.training.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"),   # grams {a b, b c}: both novel
            (2, "a b c", "en"),   # exact repeat: 0 novel of 2
            (3, "a b x", "fr"),   # {a b (seen@1), b x (novel)}
            (4, "z", "fr"),       # < n tokens: contributes nothing
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r.grp: (r.n_docs, r.distinct_grams, r.novel_grams, r.novel_bp)
        for r in ngram_novelty(docs, n=2).collect()
    }
    assert out == {"en": (2, 4, 2, 5000), "fr": (1, 2, 1, 5000)}


def test_ngram_novelty_within_doc_repeat_counts_once(spark):
    from dr_source_spark.training.text import ngram_novelty

    # "a b a b" has gram "a b" twice -> per-doc DISTINCT, so 1 occurrence;
    # grams here: {a b, b a}; both novel
    docs = spark.createDataFrame([(1, "a b a b", "en")], "doc_id long, text string, lang string")
    r = ngram_novelty(docs, n=2).collect()[0]
    assert (r.distinct_grams, r.novel_grams, r.novel_bp) == (2, 2, 10000)
