"""Exact-statistics operators (operators/stats.py) and leakage-safe
feature engineering (training/features.py) on hand-computed fixtures."""

import hashlib

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- mad_profile

def test_mad_profile_hand_computed(spark):
    from dr_source_spark.operators.stats import mad_profile

    # group a: values 1..7 plus an outlier 100 → n=8, lower median at
    # rn=(8+1) div 2=4 → v=4; deviations |v-4| = 3,2,1,0,1,2,3,96 →
    # sorted 0,1,1,2,2,3,3,96, lower median rn=4 → MAD=2; outliers:
    # dv > 3*2=6 → only the 96 row.
    rows = [("a", i, float(i)) for i in range(1, 8)] + [("a", 100, 100.0)]
    df = spark.createDataFrame(rows, "grp string, rid long, v double").select(
        "grp", "rid", F.col("v").cast("long").alias("v")
    )
    out = mad_profile(df, "grp", "v", "rid").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.med_v, r.mad_v, r.n_outliers, r.max_abs_dev) == (8, 4, 2, 1, 96)


def test_mad_profile_constant_group_no_outliers(spark):
    from dr_source_spark.operators.stats import mad_profile

    df = spark.createDataFrame(
        [("c", i, 5) for i in range(10)], "grp string, rid long, v long"
    )
    r = mad_profile(df, "grp", "v", "rid").collect()[0]
    # MAD 0: the 3*MAD fence is 0, and no deviation exceeds it
    assert (r.med_v, r.mad_v, r.n_outliers) == (5, 0, 0)


# ------------------------------------------------------------------ cov_pairs

def test_cov_pairs_hand_computed_negative(spark):
    from dr_source_spark.operators.stats import cov_pairs

    # x = [1,2,3], y = [6,4,2]: exact sample cov(x,y) = -2, var(x) = 1.
    # n*Sxy - Sx*Sy = 3*20 - 6*12 = -12; den = 3*2 = 6 → -2 exactly.
    df = spark.createDataFrame([(1, 6), (2, 4), (3, 2)], "x long, y long")
    out = {
        (r.var_x, r.var_y): r.cov
        for r in cov_pairs(df, {"x": F.col("x"), "y": F.col("y")}).collect()
    }
    assert out[("x", "y")] == -2
    assert out[("x", "x")] == 1
    assert out[("y", "y")] == 4


def test_cov_pairs_trunc_toward_zero_on_negative(spark):
    from dr_source_spark.operators.stats import cov_pairs

    # x=[0,1], y=[1,0]: num = 2*0 - 1*1 = -1, den = 2 → exact -0.5;
    # trunc-toward-zero gives 0 (floor division would give -1) — the
    # documented cross-engine contract.
    df = spark.createDataFrame([(0, 1), (1, 0)], "x long, y long")
    out = {
        (r.var_x, r.var_y): r.cov
        for r in cov_pairs(df, {"x": F.col("x"), "y": F.col("y")}).collect()
    }
    assert out[("x", "y")] == 0


# -------------------------------------------------------------- gini_by_group

def test_gini_uniform_is_zero_and_concentrated_is_high(spark):
    from dr_source_spark.operators.stats import gini_by_group

    rows = [("u", i, 10) for i in range(1, 6)]  # uniform → gini 0
    rows += [("k", 1, 0), ("k", 2, 0), ("k", 3, 0), ("k", 4, 100)]
    # k: sorted x = [0,0,0,100], Σrx = 400, Σx = 100, n = 4 →
    # (800-500)*10000 div 400*100... num = (2*400-(5)*100)*10000 = 3e6,
    # den = 400*100/100... den = n*Σx = 400 → wait: 4*100 = 400;
    # gini_bp = 3_000_000 div 400 = 7500 (= 0.75, the max for n=4).
    df = spark.createDataFrame(rows, "grp string, rid long, sz long")
    out = {r.grp: r for r in gini_by_group(df, "grp", "sz", "rid").collect()}
    assert out["u"].gini_bp == 0
    assert out["k"].gini_bp == 7500
    assert out["k"].total_size == 100


def test_gini_zero_total_is_null(spark):
    from dr_source_spark.operators.stats import gini_by_group

    df = spark.createDataFrame([("z", 1, 0), ("z", 2, 0)], "grp string, rid long, sz long")
    assert gini_by_group(df, "grp", "sz", "rid").collect()[0].gini_bp is None


# ---------------------------------------------------------- loo_target_encode

def test_loo_encode_hand_computed_and_singleton_null(spark):
    from dr_source_spark.training.features import loo_target_encode

    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 33), (4, "solo", 99)]
    df = spark.createDataFrame(rows, "rid long, k string, y long")
    out = {
        r.rid: r.loo_mean
        for r in loo_target_encode(df, "k", F.col("y"), ["rid"]).collect()
    }
    # row 1: (20+33)/2 = 26 (floor); row 2: (10+33)/2 = 21; row 3: 15
    assert out[1] == 26 and out[2] == 21 and out[3] == 15
    # singleton group: no other rows to average — NULL, never the
    # global mean (that would leak the row's own label)
    assert out[4] is None


def test_loo_encode_never_sees_own_label(spark):
    from dr_source_spark.training.features import loo_target_encode

    # two-row group: each row's encoding IS the other row's label
    df = spark.createDataFrame([(1, "g", 100), (2, "g", 0)], "rid long, k string, y long")
    out = {r.rid: r.loo_mean for r in loo_target_encode(df, "k", F.col("y"), ["rid"]).collect()}
    assert out[1] == 0 and out[2] == 100


# --------------------------------------------------------- feature_hash_profile

def _bucket(token: str, n: int = 256) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n


def test_feature_hash_profile_collision_ledger(spark):
    from dr_source_spark.training.features import feature_hash_profile

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma"), (3, None)],
        "doc_id long, text string",
    )
    out = {r.bucket: r for r in feature_hash_profile(docs, 256).collect()}
    # totals: alpha tf=2 (doc 1), beta tf=2 (docs 1,2), gamma tf=1;
    # NULL text contributes nothing
    expected = {}
    for tok, tf, docs_n in [("alpha", 2, 1), ("beta", 2, 2), ("gamma", 1, 1)]:
        b = _bucket(tok)
        agg = expected.setdefault(b, [0, set(), set()])
        agg[0] += tf
        agg[2].add(tok)
    expected[_bucket("alpha")][1].update({1})
    expected[_bucket("beta")][1].update({1, 2})
    expected[_bucket("gamma")][1].update({2})
    assert set(out) == set(expected)
    for b, (tf, dset, tset) in expected.items():
        assert out[b].total_tf == tf
        assert out[b].n_docs == len(dset)
        assert out[b].n_tokens == len(tset)


def test_feature_hash_forced_collision(spark):
    from dr_source_spark.training.features import feature_hash_profile

    # n_buckets=1 forces every token into bucket 0 — the ledger must
    # report the full distinct-token collision count
    docs = spark.createDataFrame([(1, "a b c"), (2, "a d")], "doc_id long, text string")
    r = feature_hash_profile(docs, 1).collect()
    assert len(r) == 1 and r[0].bucket == 0
    assert r[0].total_tf == 5 and r[0].n_docs == 2 and r[0].n_tokens == 4


# ------------------------------------------------------------- ols_slope

def test_ols_slope_exact_lines(spark):
    from dr_source_spark.operators.stats import ols_slope_by_group

    # group a: y = 2x exactly -> slope 2.0000 = 20000 at scale 10^4;
    # group b: y = -3x + 10 -> -30000; group c: constant x -> den 0 -> NULL
    rows = [("a", x, 2 * x) for x in (1, 2, 3, 4)]
    rows += [("b", x, 10 - 3 * x) for x in (0, 1, 2)]
    rows += [("c", 5, y) for y in (1, 2, 3)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {
        r.grp: (r.n, r.slope_x10000)
        for r in ols_slope_by_group(df, ["grp"], F.col("x"), F.col("y")).collect()
    }
    assert out["a"] == (4, 20000)
    assert out["b"] == (3, -30000)
    assert out["c"] == (3, None)


def test_ols_slope_truncates_toward_zero(spark):
    from dr_source_spark.operators.stats import ols_slope_by_group

    # x=[0,1,2], y=[0,0,1]: num = 3*2 - 3*1 = 3, den = 3*5 - 9 = 6 ->
    # exact slope 0.5 -> 5000; negated y must give exactly -5000 (sign
    # factored out, so trunc-div symmetry is pinned)
    df = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "x long, y long")
    r = ols_slope_by_group(df.withColumn("g", F.lit("g")), ["g"], F.col("x"), F.col("y")).collect()[0]
    assert r.slope_x10000 == 5000
    r2 = ols_slope_by_group(
        df.withColumn("g", F.lit("g")), ["g"], F.col("x"), -F.col("y")
    ).collect()[0]
    assert r2.slope_x10000 == -5000


# -------------------------------------------------------- quota_allocate

def test_quota_allocate_hand_computed(spark):
    from dr_source_spark.training.features import quota_allocate

    # counts a=5 b=3 c=2, total=7, N=10: base = 3,2,1 (sum 6), rems =
    # 35%10=5, 21%10=1, 14%10=4 -> one leftover seat goes to a (rem 5)
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(3)] + [("c", i) for i in range(2)]
    df = spark.createDataFrame(rows, "lang string, rid long")
    out = {r.grp: (r.n_rows, r.base_alloc, r.final_alloc)
           for r in quota_allocate(df, "lang", 7).collect()}
    assert out == {"a": (5, 3, 4), "b": (3, 2, 2), "c": (2, 1, 1)}


def test_quota_allocate_sums_to_total_and_tiebreaks_by_key(spark):
    from dr_source_spark.training.features import quota_allocate

    # equal counts -> equal remainders; ties break to the SMALLER group
    # key, and the final allocations always sum to the budget exactly
    rows = [(g, i) for g in "abcde" for i in range(3)]
    df = spark.createDataFrame(rows, "lang string, rid long")
    for total in (1, 4, 7, 14, 15):
        out = {r.grp: r.final_alloc for r in quota_allocate(df, "lang", total).collect()}
        assert sum(out.values()) == total
        # leftover seats (total % 5 here) go to the alphabetically first groups
        base, extra = divmod(total, 5)
        for i, g in enumerate("abcde"):
            assert out[g] == base + (1 if i < extra else 0)
