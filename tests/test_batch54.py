"""Batch-54 operators on hand-computed fixtures: per-language defect
density (operators/triples.py), Jaccard threshold sweep
(training/dedup.py), order-size histogram (operators/stats.py)."""

from pyspark.sql import functions as F


# -------------------------------------------------------------- defect_density

def test_defect_density_hand_computed(spark):
    from dr_source_spark.operators.triples import defect_density

    files = spark.createDataFrame(
        [
            ("r1", "a.py", "py", "l1\nl2\nl3\nl4"),      # 4 lines
            ("r1", "b.py", "py", "x\ny\nz\nw\nv\nu"),    # 6 lines
            ("r2", "c.go", "go", "one\ntwo"),            # 2 lines
        ],
        "repo string, path string, lang string, content string",
    )
    findings = spark.createDataFrame(
        [("r1", "a.py", "SQLI"), ("r1", "a.py", "XSS")],
        "repo string, path string, vuln_type string",
    )
    out = {r["lang"]: r for r in defect_density(files, findings).collect()}
    py = out["py"]
    # 2 findings over 10 lines -> 100000*2 div 10 = 20000 per 100k
    assert (py["n_files"], py["total_lines"], py["n_findings"]) == (2, 10, 2)
    assert py["per_100k_lines"] == 20000
    go = out["go"]
    assert (go["n_findings"], go["per_100k_lines"]) == (0, 0)


def test_defect_density_trailing_newline_counts_tail(spark):
    from dr_source_spark.operators.triples import defect_density

    files = spark.createDataFrame(
        [("r", "p", "py", "a\nb\n")],  # split -> ['a','b',''] = 3 lines
        "repo string, path string, lang string, content string",
    )
    findings = spark.createDataFrame(
        [], "repo string, path string, vuln_type string"
    )
    r = defect_density(files, findings).collect()[0]
    assert r["total_lines"] == 3


# ------------------------------------------------------ jaccard_threshold_sweep

def test_threshold_sweep_monotone_and_exact_dup_mass(spark):
    from dr_source_spark.training.dedup import jaccard_threshold_sweep

    # two exact dups + one near-pair family via shared shingles: use a
    # small corpus where the LSH pipeline produces at least one exact
    # pair (jaccard 1.0). Sweep counts must be monotone nonincreasing.
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [(0, text), (1, text), (2, text + " extra tail words here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["threshold_pm"]: r for r in jaccard_threshold_sweep(docs).collect()}
    counts = [out[pm]["n_pairs_ge"] for pm in (500, 700, 800, 900, 950, 1000)]
    assert counts == sorted(counts, reverse=True)
    assert out[1000]["n_pairs_ge"] >= 1          # the exact pair survives 1.0
    assert out[500]["share_bp"] <= 10000


# --------------------------------------------------------- order_size_histogram

def test_order_size_histogram_hand_computed(spark):
    from dr_source_spark.operators.stats import order_size_histogram

    rows = [(1,), (1,), (1,), (2,), (2,), (3,), (4,)]
    li = spark.createDataFrame(rows, "l_orderkey long")
    out = {r["n_lines"]: r for r in order_size_histogram(li).collect()}
    # sizes: order1=3 lines, order2=2, orders 3,4=1 each -> histogram
    # {1:2, 2:1, 3:1}; shares 5000/2500/2500 bp
    assert (out[1]["n_orders"], out[1]["share_bp"]) == (2, 5000)
    assert (out[2]["n_orders"], out[2]["share_bp"]) == (1, 2500)
    assert (out[3]["n_orders"], out[3]["share_bp"]) == (1, 2500)
