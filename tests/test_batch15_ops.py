"""Planted-truth tests for the batch-15 operators: exact isqrt,
Spearman rho, item-item cosine, TextRank keywords."""

import math
import random

from pyspark.sql import functions as F


class TestIsqrt:
    def test_exact_over_boundary_values(self, spark):
        from dr_source_spark.operators.stats import isqrt_expr

        # perfect squares, off-by-ones, zero, and huge values near the
        # double-rounding cliff
        vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**18, 10**18 - 1]
        vals += [k * k for k in (10**9, 10**9 + 1, 3037000499)]
        vals += [k * k - 1 for k in (10**9, 3037000499)]
        rng = random.Random(7)
        vals += [rng.randrange(10**30) for _ in range(50)]
        # the band where the first design's fixed +/-2 pin was wrong by
        # hundreds of units (float sqrt abs error ~ r * 2^-52): random
        # values at 1e36-1e38, plus squares/off-by-ones at the top
        vals += [rng.randrange(10**36, 10**38) for _ in range(50)]
        big = 10**19 - 6  # isqrt near the decimal38 ceiling
        vals += [big * big, big * big - 1, big * big + 1]
        df = spark.createDataFrame(
            [(str(v),) for v in vals], "v string"
        ).select(F.col("v").cast("decimal(38,0)").alias("v"))
        out = df.select(
            "v", isqrt_expr(F.col("v")).cast("decimal(38,0)").alias("r")
        ).collect()
        for row in out:
            assert int(row["r"]) == math.isqrt(int(row["v"])), row


class TestSpearman:
    def test_perfect_monotone(self, spark):
        from dr_source_spark.operators.stats import spearman_rho_grid

        df = spark.createDataFrame(
            [(i, i * i) for i in range(1, 21)], "x long, y long"
        )
        r = spearman_rho_grid(df, F.col("x"), F.col("y")).collect()[0]
        assert r["n_rows"] == 20
        assert r["rho_bp"] == 10000

    def test_perfect_inverse(self, spark):
        from dr_source_spark.operators.stats import spearman_rho_grid

        df = spark.createDataFrame(
            [(i, 100 - i) for i in range(1, 21)], "x long, y long"
        )
        r = spearman_rho_grid(df, F.col("x"), F.col("y")).collect()[0]
        assert r["rho_bp"] == -10000

    def test_matches_scipy_convention_with_ties(self, spark):
        from dr_source_spark.operators.stats import spearman_rho_grid

        # tied data; compare against a hand-rolled float Spearman with
        # average ranks (the textbook estimator) within 1 bp of the
        # integer contract (isqrt-product denominator <= true denom, so
        # the integer value can differ from the float by at most the
        # floor step)
        rng = random.Random(3)
        data = [(rng.randrange(6), rng.randrange(4)) for _ in range(200)]
        df = spark.createDataFrame(data, "x long, y long")
        r = spearman_rho_grid(df, F.col("x"), F.col("y")).collect()[0]

        def avg_ranks(vs):
            order = sorted(range(len(vs)), key=lambda i: vs[i])
            ranks = [0.0] * len(vs)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vs[order[j]] == vs[order[i]]:
                    j += 1
                avg = (i + 1 + j) / 2.0
                for k in range(i, j):
                    ranks[order[k]] = avg
                i = j
            return ranks

        xs = [d[0] for d in data]
        ys = [d[1] for d in data]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        mx = sum(rx) / len(rx)
        my = sum(ry) / len(ry)
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        rho = cov / math.sqrt(vx * vy)
        assert abs(r["rho_bp"] - rho * 10000) <= 1.5

    def test_constant_margin_is_null(self, spark):
        from dr_source_spark.operators.stats import spearman_rho_grid

        df = spark.createDataFrame([(i, 5) for i in range(10)], "x long, y long")
        r = spearman_rho_grid(df, F.col("x"), F.col("y")).collect()[0]
        assert r["rho_bp"] is None


class TestItemCosine:
    def test_planted_overlap(self, spark):
        from dr_source_spark.operators.mining import item_cosine_pairs

        # items: A in baskets {1,2,3,4}, B in {1,2}, C in {9}
        rows = [(e, "A") for e in (1, 2, 3, 4)] + [(1, "B"), (2, "B"), (9, "C")]
        df = spark.createDataFrame(rows, "ent long, item string")
        out = {
            (r["item_a"], r["item_b"]): r
            for r in item_cosine_pairs(df, min_co=1).collect()
        }
        r = out[("A", "B")]
        assert (r["n_co"], r["n_a"], r["n_b"]) == (2, 4, 2)
        # cos = 2/sqrt(8) = 0.7071 -> floor bp over isqrt(8)=2: 20000//2
        assert r["cos_bp"] == 20000 // math.isqrt(8)
        assert ("A", "C") not in out

    def test_duplicate_rows_do_not_inflate(self, spark):
        from dr_source_spark.operators.mining import item_cosine_pairs

        rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
        df = spark.createDataFrame(rows, "ent long, item string")
        r = item_cosine_pairs(df, min_co=1).collect()[0]
        assert (r["n_co"], r["n_a"], r["n_b"]) == (2, 2, 2)
        assert r["cos_bp"] == 10000

    def test_whale_cap_drops_basket(self, spark):
        from dr_source_spark.operators.mining import item_cosine_pairs

        rows = [(1, c) for c in "ABCDE"] + [(2, "A"), (2, "B")]
        df = spark.createDataFrame(rows, "ent long, item string")
        out = item_cosine_pairs(df, min_co=1, max_basket=4).collect()
        # entity 1 (basket of 5) is dropped; only (A,B) via entity 2
        # survives — but note n_a/n_b still count the full incidence
        pairs = {(r["item_a"], r["item_b"]) for r in out}
        assert pairs == {("A", "B")}


class TestTextRank:
    def test_collocation_graph_pagerank_hub_ranks_higher(self, spark):
        from dr_source_spark.operators.graph import pagerank_fixed_point

        # star graph: center connected to 4 leaves (undirected) —
        # center must outrank every leaf
        pairs = [("hub", leaf) for leaf in ("a", "b", "c", "d")]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src string, dst string"
        )
        out = {r["node"]: r["rank"] for r in pagerank_fixed_point(edges).collect()}
        assert all(out["hub"] > out[leaf] for leaf in "abcd")
