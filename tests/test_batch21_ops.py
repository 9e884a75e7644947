"""Planted-truth tests for the batch-21 operators: consistent-hash
reshard planning, the ANALYZE-style column-stats collector, and the
cumulative decile-lift table."""

from pyspark.sql import functions as F


class TestReshardPlan:
    def test_ring_moves_only_to_new_shard(self, spark):
        """The consistency property itself: growing the ring 4 -> 5 may
        only move keys TO the new shard (old ring points are unchanged,
        so a key's successor either stays or becomes a new-shard vnode).
        """
        from dr_source_spark.operators.layout import ring_assign_expr

        df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        out = df.select(
            ring_assign_expr(F.col("doc_id"), 4, vnodes=16).alias("old_s"),
            ring_assign_expr(F.col("doc_id"), 5, vnodes=16).alias("new_s"),
        ).collect()
        moved = [(r["old_s"], r["new_s"]) for r in out if r["old_s"] != r["new_s"]]
        assert moved, "some keys must move when a shard is added"
        assert all(new == 4 for _, new in moved)

    def test_census_arithmetic(self, spark):
        from dr_source_spark.operators.layout import reshard_plan

        df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
        out = {r["strategy"]: r for r in reshard_plan(df, "doc_id", 4, 5, vnodes=16).collect()}
        assert set(out) == {"mod", "ring"}
        for r in out.values():
            assert r["n_rows"] == 200
            assert r["moved_bp"] == 10000 * r["n_moved"] // 200
        # consistent hashing must beat modulo by a wide margin
        assert out["ring"]["n_moved"] < out["mod"]["n_moved"]

    def test_assignment_in_range(self, spark):
        from dr_source_spark.operators.layout import ring_assign_expr

        df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
        vals = {
            r["s"]
            for r in df.select(
                ring_assign_expr(F.col("doc_id"), 3, vnodes=8).alias("s")
            ).collect()
        }
        assert vals <= {0, 1, 2}


class TestAnalyzeTableStats:
    def test_planted_counters(self, spark):
        from dr_source_spark.operators.stats import analyze_table_stats

        df = spark.createDataFrame(
            [(1, "aa"), (2, None), (3, "aa"), (4, "bbbb")],
            "k long, s string",
        )
        out = {r["col_name"]: r for r in analyze_table_stats(df).collect()}
        assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
        assert out["k"]["n_distinct"] == 4
        assert out["k"]["avg_len_x100"] == 100  # every key renders 1 char
        assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
        # lengths 2, 2, 4 over 3 non-null rows -> 266
        assert out["s"]["avg_len_x100"] == (100 * 8) // 3

    def test_all_null_column(self, spark):
        from dr_source_spark.operators.stats import analyze_table_stats

        df = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
        out = {r["col_name"]: r for r in analyze_table_stats(df, ["s"]).collect()}
        r = out["s"]
        assert (r["n_nulls"], r["n_distinct"]) == (2, 0)
        assert r["avg_len_x100"] is None  # width undefined, not 0


class TestDecileLift:
    def test_ten_singleton_tiles(self, spark):
        from dr_source_spark.operators.stats import decile_lift

        df = spark.createDataFrame(
            [(e, (10 - e) * 100) for e in range(10)], "ent long, cents long"
        )
        out = {r["tile"]: r for r in decile_lift(df, "ent", F.col("cents")).collect()}
        assert len(out) == 10
        total = sum((10 - e) * 100 for e in range(10))  # 5500
        # tile 1 = the top spender (ent 0, 1000c)
        assert out[1]["n_entities"] == 1
        assert out[1]["revenue_cents"] == 1000
        assert out[1]["share_bp"] == 10000 * 1000 // total
        assert out[1]["lift_x10000"] == (10000 * 1000 // total) * 10 // 1
        # final tile closes at exactly 10000 cumulative share and lift
        assert out[10]["cum_share_bp"] == 10000
        assert out[10]["lift_x10000"] == 10000

    def test_rows_collapse_per_entity_first(self, spark):
        from dr_source_spark.operators.stats import decile_lift

        # entity 1 spends 2x50, entity 2 spends 1x100: a tie broken by
        # entity id (asc) -> entity 1 ranks first
        df = spark.createDataFrame(
            [(1, 50), (1, 50), (2, 100)], "ent long, cents long"
        )
        out = decile_lift(df, "ent", F.col("cents"), n_tiles=2).collect()
        tiles = {r["tile"]: r for r in out}
        assert tiles[1]["n_entities"] == 1 and tiles[1]["revenue_cents"] == 100
        assert tiles[2]["revenue_cents"] == 100
