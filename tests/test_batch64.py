"""Batch-64 operators on hand-computed fixtures: supplier catalog
breadth (operators/relational.py), findings-per-file histogram
(operators/triples.py), token-length histogram (training/text.py)."""

from pyspark.sql import functions as F


# ------------------------------------------------------------- catalog_breadth

def test_catalog_breadth_hand_computed(spark):
    from dr_source_spark.operators.relational import catalog_breadth

    li = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2), (10, 3), (20, 3)],
        "l_suppkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "p_partkey long, p_brand string"
    )
    out = {r["l_suppkey"]: r for r in catalog_breadth(li, part).collect()}
    s10 = out[10]
    # supplies parts {1,2,3} of a 3-part observed catalog, brands {A,B}
    assert (s10["n_parts_supplied"], s10["catalog_share_bp"], s10["n_brands"]) == (3, 10000, 2)
    s20 = out[20]
    assert (s20["n_parts_supplied"], s20["catalog_share_bp"], s20["n_brands"]) == (1, 3333, 1)


# ------------------------------------------------------------ findings_per_file

def test_findings_per_file_hand_computed(spark):
    from dr_source_spark.operators.triples import findings_per_file

    rows = [
        ("r", "a.py", "X"), ("r", "a.py", "Y"), ("r", "a.py", "Z"),
        ("r", "b.py", "X"),
        ("r2", "b.py", "X"),  # same path, different repo -> separate file
    ]
    df = spark.createDataFrame(rows, "repo string, path string, vuln_type string")
    out = {r["n_findings_per_file"]: r for r in findings_per_file(df).collect()}
    assert (out[1]["n_files"], out[1]["share_bp"]) == (2, 6666)
    assert (out[3]["n_files"], out[3]["share_bp"]) == (1, 3333)


# ------------------------------------------------------ token_length_histogram

def test_token_lengths_clamp_and_shares(spark):
    from dr_source_spark.training.text import token_length_histogram

    rows = [
        (0, "a bb ccc"),
        (1, "x" * 100),   # megatoken clamps into the tail bucket
        (2, None),        # NULL contributes no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["token_len"]: r for r in token_length_histogram(df).collect()}
    assert out[1]["n_tokens"] == 1 and out[2]["n_tokens"] == 1
    assert out[3]["n_tokens"] == 1
    assert out[30]["n_tokens"] == 1       # the clamped megatoken
    assert sum(r["n_tokens"] for r in out.values()) == 4
    assert out[1]["share_bp"] == 2500
