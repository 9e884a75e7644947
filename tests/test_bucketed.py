"""Plan gates for bucketed co-located joins (sources/bucketed.py): the
bucketed big-big join must plan with ZERO exchanges and ZERO sorts
(both paid once at write time), while the identical plain-parquet join
shuffles both sides — the receipt that the write-once/join-free
strategy actually engages on this engine."""

import pytest
from pyspark.sql import functions as F

from dr_source_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 89).alias("b")
    )
    write_bucketed(left, "t_left_b", "k", 8, path=str(wh / "l"))
    write_bucketed(right, "t_right_b", "k", 8, path=str(wh / "r"))
    yield left, right
    spark.sql("DROP TABLE IF EXISTS t_left_b")
    spark.sql("DROP TABLE IF EXISTS t_right_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_and_no_sort(spark, bucketed_tables):
    # force the SMJ path so the bucket layout (not a broadcast) carries
    # the join; on real big-big sides this is the planner's own choice.
    # Sort elision needs BOTH one-file-per-bucket (write_bucketed's
    # repartition guarantees it) and the post-3.0 opt-in conf.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        plan = _plan(colocated_join(spark, "t_left_b", "t_right_b", "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan   # the write-time shuffle is the only one, ever
    assert "Sort [" not in plan, plan     # sortBy at write, one file per bucket


def test_bucketed_join_is_exchange_free_even_without_sort_elision(spark, bucketed_tables):
    """With the default (non-legacy) scan config the Sort reappears but
    the join still runs with ZERO exchanges — the part of the payoff no
    conf can turn off."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(colocated_join(spark, "t_left_b", "t_right_b", "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_plain_parquet_join_shuffles_both_sides(spark, bucketed_tables, tmp_path):
    left, right = bucketed_tables
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark.read.parquet(lp).join(spark.read.parquet(rp), "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_bucketed_join_result_equals_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = colocated_join(spark, "t_left_b", "t_right_b", "k").agg(
        F.count("*").alias("n"), F.sum(F.col("a") * F.col("b")).alias("s")
    ).collect()[0]
    exp = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("a") * F.col("b")).alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (exp.n, exp.s)


def test_bucketed_groupby_on_bucket_key_needs_no_exchange(spark, bucketed_tables):
    """Bucketing pays off for aggregation too: a groupBy on the bucket
    key reads the layout and skips the shuffle."""
    plan = _plan(spark.table("t_left_b").groupBy("k").agg(F.sum("a").alias("s")))
    assert "Exchange" not in plan, plan
