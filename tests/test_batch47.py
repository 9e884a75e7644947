"""Batch-47 operators on hand-computed fixtures: embedding centroid
drift, exact power-iteration PCA (training/similarity.py), per-group
duplicate rate (training/dedup.py)."""

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# -------------------------------------------------------------- centroid_drift

def test_centroid_drift_hand_computed(spark):
    from dr_source_spark.training.similarity import centroid_drift

    # vectors quantize to themselves when max|v| = 127 (scale 1):
    # even ids (cohort A): q = [127, 0]; odd ids (B): q = [-127, 127].
    rows = [
        (0, [127.0, 0.0]),
        (2, [127.0, 0.0]),
        (1, [-127.0, 127.0]),
    ]
    out = {r["dim"]: r for r in centroid_drift(_emb(spark, rows)).collect()}
    d0 = out[0]
    assert (d0["n_a"], d0["n_b"]) == (2, 1)
    assert (d0["mean_a_fp"], d0["mean_b_fp"]) == (127_000_000, -127_000_000)
    assert d0["drift_fp"] == 254_000_000
    d1 = out[1]
    assert (d1["mean_a_fp"], d1["mean_b_fp"], d1["drift_fp"]) == (
        0, 127_000_000, 127_000_000,
    )


def test_centroid_drift_truncation_toward_zero(spark):
    from dr_source_spark.training.similarity import centroid_drift

    # cohort B mean = -127/3: fixed point -42333333 TRUNCATED toward
    # zero (floor would give -42333334).
    rows = [
        (0, [0.0]),
        (1, [-127.0]),
        (3, [0.0]),
        (5, [-127.0]),
    ]
    out = centroid_drift(_emb(spark, rows)).collect()[0]
    assert out["mean_b_fp"] == -84_666_666  # (-254*1e6) div 3 truncated
    assert out["mean_a_fp"] == 0


# ----------------------------------------------------------- pca_top_component

def test_pca_top_component_axis_aligned(spark):
    from dr_source_spark.training.similarity import pca_top_component

    # variance lives entirely on dim 0: vectors (±127, small dim-1
    # noise with zero pairing). Scatter is dominated by S[0][0]; the
    # iteration converges onto dim 0 with positive sign pinned.
    rows = [
        (0, [127.0, 1.0]),
        (1, [-127.0, 1.0]),
        (2, [127.0, -1.0]),
        (3, [-127.0, -1.0]),
    ]
    out = {r["dim"]: r["component_fp"] for r in pca_top_component(_emb(spark, rows)).collect()}
    assert abs(out[0]) > 1000 * max(1, abs(out[1]))
    assert out[0] > 0  # sign pin: first nonzero component positive


def test_pca_matches_pure_python_reference(spark):
    from dr_source_spark.training.similarity import pca_top_component

    # cell-exact parity with an independent pure-Python implementation
    # of the pinned arithmetic on an irregular fixture
    vecs = {
        0: [3.0, -1.0, 2.0],
        1: [-2.0, 4.0, 0.5],
        2: [1.0, 1.0, -3.0],
        3: [0.5, -2.0, 1.5],
        4: [2.0, 2.0, 2.0],
    }

    def quant(v):
        m = max(abs(x) for x in v) or 1.0
        s = m / 127.0
        # Spark round() is HALF_UP on doubles; python round is banker's
        import decimal
        return [int(decimal.Decimal(x / s).quantize(0, rounding=decimal.ROUND_HALF_UP)) for x in v]

    q = {k: quant(v) for k, v in vecs.items()}
    n = len(q)
    dims = range(3)
    sd = [sum(q[k][d] for k in q) for d in dims]
    S = {
        (i, j): n * sum(q[k][i] * q[k][j] for k in q) - sd[i] * sd[j]
        for i in dims
        for j in dims
    }

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    x = {d: 1 for d in dims}
    for _ in range(8):
        nx = {d: 0 for d in dims}
        for (i, j), v in S.items():
            nx[i] += v * x[j]
        mx = max(abs(v) for v in nx.values())
        g = max(1, mx // 10**5)
        x = {d: tdiv(v, g) for d, v in nx.items()}
    flip = next((1 if x[d] > 0 else -1) for d in dims if x[d] != 0)
    expect = {d: flip * x[d] for d in dims}

    rows = [(k, v) for k, v in vecs.items()]
    got = {
        r["dim"]: r["component_fp"]
        for r in pca_top_component(_emb(spark, rows)).collect()
    }
    assert got == expect


# ------------------------------------------------------------ dup_rate_by_group

def test_dup_rate_by_group(spark):
    from dr_source_spark.training.dedup import dup_rate_by_group

    docs = spark.createDataFrame(
        [
            (1, "en", "hello world"),
            (2, "en", "hello world"),
            (3, "en", "unique"),
            (4, "fr", None),
            (5, "fr", ""),   # NULL coalesces to '' -> duplicate of row 4
            (6, "de", "solo"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["grp"]: r for r in dup_rate_by_group(docs).collect()}
    assert (out["en"]["n_docs"], out["en"]["n_distinct"], out["en"]["dup_rate_bp"]) == (3, 2, 3333)
    assert (out["fr"]["n_distinct"], out["fr"]["dup_rate_bp"]) == (1, 5000)
    assert out["de"]["dup_rate_bp"] == 0
