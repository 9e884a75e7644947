"""Dynamic Partition Pruning receipt: on a date-partitioned fact table,
a join against a selectively-filtered dimension must prune fact
partitions AT RUNTIME (the dim filter isn't knowable at plan time) —
the feature that turns "scan 3 years of events" into "scan the 3 days
the dim selects" on a 100 TB partitioned lake. Spark plans it as a
dynamicpruning subquery expression inside the scan's PartitionFilters."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_fact(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dpp") / "fact")
    spark.range(0, 10000).select(
        (F.col("id") % 50).alias("day_key"),
        (F.col("id") % 997).alias("v"),
    ).write.partitionBy("day_key").parquet(p)
    return p


def test_join_on_partition_key_plans_dynamic_pruning(spark, partitioned_fact):
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(partitioned_fact)
    dim = spark.range(0, 50).select(
        F.col("id").alias("day_key"), (F.col("id") % 7).alias("tag")
    )
    q = fact.join(dim.filter(F.col("tag") == 3), "day_key").agg(
        F.sum("v").alias("s")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    # and the pruning actually works: runtime scans only the selected
    # partitions' rows (7 of 50 day_keys carry tag==3)
    q.collect()
    final = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in final or "SubqueryBroadcast" in final, final


def test_static_partition_filter_prunes_at_plan_time(spark, partitioned_fact):
    """The static sibling: a literal predicate on the partition column
    must land in PartitionFilters (plan-time pruning), never as a
    post-scan Filter over all partitions."""
    fact = spark.read.parquet(partitioned_fact)
    plan = (
        fact.filter(F.col("day_key") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters" in scan and "day_key" in scan.split("PartitionFilters", 1)[1][:200], plan
