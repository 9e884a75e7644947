"""Bucketed co-located joins: the exchange-free big-big join strategy.

At 100 TB the most expensive plan fragment is the shuffle on a big-big
join (fact-fact, findings-vs-previous-scan, lineitem-orders). Broadcast
handles small sides and AQE handles skew, but when BOTH sides are huge
and the join recurs (the same keys every day), the answer is BUCKETING:
write each table pre-hash-partitioned and pre-sorted on the join key so
every future join is a zero-exchange, zero-sort SortMergeJoin — the
shuffle is paid ONCE at write time and amortized over every read.

Spark's native form is ``DataFrameWriter.bucketBy(n, key).sortBy(key)``
into a table catalog; the reader picks the co-located plan up from the
table metadata automatically. Requirements this module encodes:

* both sides bucketed INTO THE SAME NUMBER OF BUCKETS on the join key
  (mismatched counts re-shuffle the smaller side);
* ``spark.sql.sources.bucketing.enabled`` true (default);
* read through the TABLE (``spark.table``) — reading the bare parquet
  files bypasses the bucket metadata and silently reverts to shuffling;
* for SORT elision on top of exchange elision: one file per bucket
  (``write_bucketed`` repartitions on the key to guarantee it) AND
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — since
  Spark 3.0 the scan does not advertise per-bucket sortedness by
  default (multi-file buckets made it unsound), so the opt-in is
  required even when the layout qualifies. The exchange elision — the
  expensive half — needs no conf.

``tests/test_bucketed.py`` plan-gates the payoff: the bucketed join
plans with NO Exchange on either side, and (both sides sorted at write)
no Sort above the scans, while the identical plain-parquet join
shuffles both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table on the
    join key. The one-time shuffle that buys every later join its
    exchange-free plan. ``path`` makes it an external table (the
    warehouse dir is a static conf, so tests point each table at a
    tmp path instead).

    The repartition on the bucket key into exactly n_buckets tasks
    gives ONE file per bucket (repartition and bucketBy share the
    murmur3-pmod hash): with multiple files per bucket Spark cannot
    trust cross-file sortedness and re-sorts above every read, which
    forfeits half the payoff. At 100 TB pick n_buckets so one bucket
    ≈ one task's worth of data (total_bytes / ~256 MB)."""
    if sort:
        df = df.repartition(n_buckets, key)
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. Reads via
    spark.table so the bucket metadata (and therefore the exchange-free
    plan) applies."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
